"""Sentence-boundary chunking."""

import ray.data

from topicrawler_ray.stages.chunking import chunk_text


class TestChunkText:
    def test_budget_respected_at_boundaries(self):
        text = "One two three. Four five six. Seven eight nine."
        chunks = chunk_text(text, max_tokens=6)
        # each sentence is 3 tokens -> two sentences per chunk
        assert [n for n, _ in chunks] == [6, 3]
        assert chunks[0][1].count(".") == 2

    def test_oversized_sentence_kept_whole(self):
        text = "A b c d e f g h."
        chunks = chunk_text(text, max_tokens=3)
        assert len(chunks) == 1
        assert chunks[0][0] >= 8

    def test_empty(self):
        assert chunk_text("", 10) == []


class TestChunkDocuments:
    def test_distributed_rows(self, ray_session):
        from topicrawler_ray.stages.chunking import chunk_documents

        docs = ray.data.from_items(
            [{"doc_id": 0, "text": "Alpha beta. Gamma delta. Epsilon zeta."}]
        )
        rows = chunk_documents(docs, max_tokens=4).take_all()
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert all(r["doc_id"] == 0 for r in rows)
        joined = " ".join(r["chunk"] for r in rows)
        assert "Alpha beta." in joined and "Epsilon zeta." in joined
