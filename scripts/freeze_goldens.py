"""Freeze golden oracle fixtures for the four queries whose sequential
derivation would otherwise share code with the engine kernels it
certifies (VERDICT r2 item 3: langid, knn_ivf, media_features,
media_frames, extract_boilerpipe).

This script is the ONLY place those kernels are invoked oracle-side:
it runs them ONCE, writes the outputs as parquet goldens under
``topicrawler_ray/resources/goldens/<sf>/``, and the goldens are
committed to git.  The oracle builders in ``topicrawler_ray/oracles.py``
then just READ the goldens - they import nothing from ``stages/`` or
``functions/`` - so a regression in either the kernel or the Ray
plumbing breaks the driver's hash compare instead of silently moving
the oracle along with the bug.

Usage: python scripts/freeze_goldens.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

import heapq
import math
import os
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from topicrawler_ray.oracles import GOLDEN_ROOT  # noqa: E402


def _docs_table(sf_dir):
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def freeze_langid(sf_dir) -> pa.Table:
    from topicrawler_ray.stages.textstats import LangId

    t = _docs_table(sf_dir)
    li = LangId()
    preds = [li.classify(x) for x in t.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
        }
    )


def freeze_media_features(sf_dir) -> pa.Table:
    from topicrawler_ray.functions.hashing import murmur3_x64_128

    ids = _docs_table(sf_dir).column("doc_id").to_pylist()
    o_type, o_mean = [], []
    for i in ids:
        kind = ("image/png", "audio/wav", "video/mp4")[i % 3]
        o_type.append(kind)
        if not kind.startswith("image"):
            o_mean.append(None)
            continue
        h1, h2 = murmur3_x64_128(b"media-%d" % i)
        payload = (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")) * (8 + i % 8)
        n = 8 * 8 * 3
        arr = np.frombuffer(
            (payload * (n // max(1, len(payload)) + 1))[:n], dtype=np.uint8
        )
        o_mean.append(float(np.mean(arr)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(o_type, pa.string()),
            "pixel_mean": pa.array(o_mean, pa.float64()),
        }
    )


def freeze_media_frames(sf_dir) -> pa.Table:
    from topicrawler_ray.functions.hashing import murmur3_x64_128

    ids = _docs_table(sf_dir).column("doc_id").to_pylist()
    o_id, o_idx, o_h = [], [], []
    for i in ids:
        if i % 3 != 2:  # only video/mp4 rows sample frames
            continue
        h1, h2 = murmur3_x64_128(b"media-%d" % i)
        payload = (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")) * (8 + i % 8)
        dur = 1000 + (i % 30) * 500
        for k, t in enumerate(range(0, max(1, dur), 1000)):
            o_id.append(i)
            o_idx.append(k)
            o_h.append(murmur3_x64_128(payload + t.to_bytes(4, "little"))[0] % (1 << 31))
    return pa.table(
        {
            "media_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_idx, pa.int64()),
            "frame_hash": pa.array(o_h, pa.int64()),
        }
    )


def freeze_extract_boilerpipe(sf_dir) -> pa.Table:
    from topicrawler_ray.functions.boilerpipe import article_text
    from topicrawler_ray.sources.pages import pages_path
    from topicrawler_ray.stages.extract import decode_page_bytes, is_robots_url

    t = pq.read_table(pages_path(sf_dir), columns=["url", "html"])
    urls, texts = [], []
    for url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        if is_robots_url(url):
            continue
        urls.append(url)
        texts.append(article_text(decode_page_bytes(url, html)))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "article_text": pa.array(texts, pa.large_string()),
        }
    )


def freeze_knn_ivf(sf_dir) -> pa.Table:
    from topicrawler_ray.stages.similarity import _normalize, kmeans_lite

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    k, n_lists, nprobe = 10, 8, 3

    q = _normalize(
        np.array(
            [vecs[np.nonzero(ids == i)[0][0]] for i in sorted(ids[ids < 5])],
            dtype=np.float64,
        ).astype(np.float32)
    )

    total = len(ids)
    stride = max(1, (total + 4096 - 1) // 4096)
    mask = (ids % stride) == 0
    sorder = np.argsort(ids[mask])
    sample = vecs[mask][sorder][:4096]
    cent = kmeans_lite(sample, n_lists)

    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [set(map(int, row)) for row in probes]

    mat_all = _normalize(vecs)
    assign = np.argmax(mat_all @ cent.T, axis=1).astype(np.int32)

    heaps = {}
    for lid in sorted(set(int(a) for a in assign)):
        qids = [qi for qi, s in enumerate(probe_sets) if lid in s]
        if not qids:
            continue
        sel = np.nonzero(assign == lid)[0]
        sel = sel[np.argsort(ids[sel])]
        mat = _normalize(vecs[sel])
        gids = ids[sel]
        sims = q[qids] @ mat.T
        kk = min(k, sims.shape[1])
        for row, qi in enumerate(qids):
            idx = np.lexsort((gids, -sims[row]))[:kk]
            for j in idx:
                heapq.heappush(
                    heaps.setdefault(qi, []), (float(sims[row, j]), -int(gids[j]))
                )
                if len(heaps[qi]) > k:
                    heapq.heappop(heaps[qi])
    o_q, o_rank, o_id, o_c = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda v: (-v[0], -v[1]))
        for rank, (c, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(int(math.floor(c * 10000)))
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "rank": pa.array(o_rank, pa.int64()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine_e4": pa.array(o_c, pa.int64()),
        }
    )


def freeze_knn_lsh(sf_dir) -> pa.Table:
    """Sequential replication of stages/similarity.py:lsh_topk with the
    query parameters of __ray_entry__._q_knn_lsh (k=10, n_bits=8,
    probe_hamming=1, queries = vec_id < 5)."""
    from topicrawler_ray.stages.similarity import (
        _normalize,
        lsh_planes,
        lsh_signatures,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    k, n_bits = 10, 8

    q = _normalize(
        np.array(
            [vecs[np.nonzero(ids == i)[0][0]] for i in sorted(ids[ids < 5])],
            dtype=np.float64,
        ).astype(np.float32)
    )
    planes = lsh_planes(q.shape[1], n_bits)
    qsigs = lsh_signatures(q, planes)
    probe_map = {}
    for qi, sig in enumerate(map(int, qsigs)):
        for bkt in {sig} | {sig ^ (1 << b) for b in range(n_bits)}:
            probe_map.setdefault(bkt, []).append(qi)

    sigs = lsh_signatures(_normalize(vecs), planes).astype(np.int64)
    heaps = {}
    for bkt in sorted(set(map(int, sigs))):
        qids = probe_map.get(bkt, [])
        if not qids:
            continue
        sel = np.nonzero(sigs == bkt)[0]
        sel = sel[np.argsort(ids[sel])]
        mat = _normalize(vecs[sel])
        gids = ids[sel]
        sims = q[qids] @ mat.T
        kk = min(k, sims.shape[1])
        for row, qi in enumerate(qids):
            idx = np.lexsort((gids, -sims[row]))[:kk]
            for j in idx:
                heapq.heappush(
                    heaps.setdefault(qi, []), (float(sims[row, j]), -int(gids[j]))
                )
                if len(heaps[qi]) > k:
                    heapq.heappop(heaps[qi])
    o_q, o_rank, o_id, o_c = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda v: (-v[0], -v[1]))
        for rank, (c, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(int(math.floor(c * 10000)))
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "rank": pa.array(o_rank, pa.int64()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine_e4": pa.array(o_c, pa.int64()),
        }
    )


def freeze_langid_wordlist(sf_dir) -> pa.Table:
    from topicrawler_ray.stages.textstats import WordListLangId

    t = _docs_table(sf_dir)
    li = WordListLangId()
    preds, covs = [], []
    for x in t.column("text").to_pylist():
        lang, cov = li.classify(x)
        preds.append(lang)
        covs.append(int(math.floor(cov * 10000)))
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
            "lang_cov_e4": pa.array(covs, pa.int64()),
        }
    )


def freeze_semantic_centroids(sf_dir) -> pa.Table:
    """Centroid matrix for semantic_dedup (n_clusters=8): the ONLY
    float-trained artifact of that query.  The oracle reads these rows
    and re-derives quantization, assignment, pairwise scores, and the
    keep rule with its own dict loops."""
    from topicrawler_ray.stages.similarity import kmeans_lite

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    total = len(ids)
    stride = max(1, (total + 4096 - 1) // 4096)
    mask = (ids % stride) == 0
    sorder = np.argsort(ids[mask])
    sample = vecs[mask][sorder][:4096]
    cent = kmeans_lite(sample, 8)
    return pa.table(
        {
            "cluster_id": pa.array(np.arange(len(cent)), pa.int64()),
            "centroid": pa.array(
                [row.astype(np.float32).tolist() for row in cent],
                pa.list_(pa.float32()),
            ),
        }
    )


FREEZERS = {
    "langid": freeze_langid,
    "semantic_centroids": freeze_semantic_centroids,
    "langid_wordlist": freeze_langid_wordlist,
    "media_features": freeze_media_features,
    "media_frames": freeze_media_frames,
    "extract_boilerpipe": freeze_extract_boilerpipe,
    "knn_ivf": freeze_knn_ivf,
    "knn_lsh": freeze_knn_lsh,
}


def main(sf_dirs):
    for sf_dir in sf_dirs:
        name = Path(sf_dir).name or "sf"
        out_dir = GOLDEN_ROOT / name
        out_dir.mkdir(parents=True, exist_ok=True)
        for qname, fn in FREEZERS.items():
            table = fn(sf_dir)
            out = out_dir / ("%s.parquet" % qname)
            pq.write_table(table, out, compression="zstd")
            print("%s/%s: %d rows -> %s" % (name, qname, table.num_rows, out))




def _golden_normalize(m):
    """Row L2-normalize (independent re-derivation - imports nothing
    from the engine; zero rows pass through)."""
    out = np.array(m, copy=True)
    norms = np.sqrt((out.astype(np.float64) ** 2).sum(axis=1))
    norms = norms.astype(out.dtype)
    nz = norms != 0
    out[nz] = out[nz] / norms[nz, None]
    return out


def _golden_kmeans(vecs, n_lists, iters=5, seed=23):
    """Seeded mini k-means re-derived with plain numpy so the frozen
    golden shares NO centroid-training code with the engine kernel it
    certifies (spec: normalize, Generator(PCG64(seed)).choice init
    without replacement, argmax-cosine assignment, renormalized means,
    5 iterations)."""
    vecs = _golden_normalize(np.asarray(vecs, dtype=np.float32))
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(vecs), size=min(n_lists, len(vecs)), replace=False)
    cent = vecs[pick]
    for _ in range(iters):
        assign = np.argmax(vecs @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = vecs[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def freeze_diverse_sample(sf_dir) -> pa.Table:
    """Sequential cluster-balanced sampling golden: replicates the
    deterministic centroid training (id-decimated sample + seeded
    k-means, re-derived above), nearest-centroid assignment, and
    lowest-hash per-cluster quota."""
    import pandas as pd

    QUOTA, N_LISTS, MAX_SAMPLE = 8, 16, 4096
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    total = len(ids)
    stride = max(1, (total + MAX_SAMPLE - 1) // MAX_SAMPLE)
    order = np.argsort(ids, kind="stable")
    sample_idx = [i for i in order if ids[i] % stride == 0][:MAX_SAMPLE]
    cent = _golden_kmeans(vecs[sample_idx], N_LISTS)
    mat = _golden_normalize(vecs)
    cluster = np.argmax(mat @ cent.T, axis=1).astype(np.int64)
    prio = pd.util.hash_array(np.ascontiguousarray(ids)).view(np.int64)
    neg = -prio  # numpy int64 negation, exactly the engine's score
    o_id, o_c, o_r = [], [], []
    for c in np.unique(cluster):
        members = np.nonzero(cluster == c)[0]
        # engine ranks by (neg_priority DESC, id ASC)
        ranked = sorted(members, key=lambda i: (-int(neg[i]), int(ids[i])))
        for r, i in enumerate(ranked[:QUOTA]):
            o_id.append(int(ids[i]))
            o_c.append(int(c))
            o_r.append(r)
    return pa.table(
        {
            "vec_id": pa.array(o_id, pa.int64()),
            "cluster": pa.array(o_c, pa.int64()),
            "rank": pa.array(o_r, pa.int64()),
        }
    )


FREEZERS["sample_diverse"] = freeze_diverse_sample


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
