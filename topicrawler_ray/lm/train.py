"""Deterministic topic-LM construction for the crawl pipelines.

The reference serves a pre-trained 5-gram BerkeleyLM over RMI
(``lt.lm/.../app/StartLM.java:432-480``); our engine loads a model
artifact once per scorer actor from the Ray object store (``ray.put`` on
the driver, ``ray.get`` in each actor ``__init__`` - broadcast once, not
re-shipped per batch).

Training corpus (deterministic spec of the fixture universe):

* the extracted oracle text of every page whose ``doc_id % 3 == 0``
  (the "focused topic" sample), run through the same
  sentence-split/tokenize path the scorer uses, and
* 800 vocabulary-inflation sentences of synthetic words ``w0000..w7999``
  - these push the Laplace vocabulary V to ~8k so all-OOV documents land
  in the NORMAL priority bucket (perp ~ V > 5e3) and partially-noisy
  documents land in MEDIUM, giving the prioritizer real work.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq

from ..functions import ngrams as ngram_mod
from ..functions.sentences import split_sentences
from ..functions.tokenizer import filtered_and_normalized_tokens
from .backoff import NgramCounts, StupidBackoffLM, freeze_lm
from .counting import CountingLM, LaplaceSmoothedLM

DEFAULT_ORDER = 3
TRAIN_DOC_MOD = 3  # doc_id % 3 == 0 -> training document
VOCAB_INFLATION = 8000
VOCAB_SENT_LEN = 10


def training_sentences_from_text(text: str) -> list[str]:
    return split_sentences(text)


def _letter_word(prefix: str, i: int) -> str:
    """Letters-only synthetic word (digits would be WORD_WITH_NUMBER and
    get dropped by the scorer's level-5 token filter)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    n = i
    while True:
        out.append(letters[n % 26])
        n //= 26
        if n == 0:
            break
    return prefix + "".join(reversed(out))


def vocab_inflation_sentences(n_words: int = VOCAB_INFLATION) -> list[str]:
    out = []
    for start in range(0, n_words, VOCAB_SENT_LEN):
        out.append(
            " ".join(_letter_word("w", i) for i in range(start, start + VOCAB_SENT_LEN))
        )
    return out


def _doc_id_from_url(url: str) -> int | None:
    # http://host{h}.example/p{doc_id}
    tail = url.rsplit("/p", 1)
    if len(tail) != 2 or not tail[1].isdigit():
        return None
    return int(tail[1])


def iter_training_sentences(sf_dir: str):
    """Deterministic training-sentence stream: topic pages + vocab filler."""
    from ..sources.pages import pages_path

    pages = pq.read_table(pages_path(sf_dir), columns=["url", "text"])
    urls = pages.column("url").to_pylist()
    texts = pages.column("text").to_pylist()
    for url, text in zip(urls, texts):
        doc_id = _doc_id_from_url(url)
        if doc_id is None or doc_id % TRAIN_DOC_MOD != 0:
            continue
        yield from training_sentences_from_text(text)
    yield from vocab_inflation_sentences()


def _tokenize_for_lm(sentence: str) -> list[str]:
    tokens = filtered_and_normalized_tokens(sentence)
    if not tokens:
        return []
    return ngram_mod.insert_sentence_tags(tokens, mode=3)


@lru_cache(maxsize=4)
def build_topic_counts(sf_dir: str, order: int = DEFAULT_ORDER) -> NgramCounts:
    """Shared deterministic training counts for every scorer variant."""
    counts = NgramCounts(order)
    for sentence in iter_training_sentences(sf_dir):
        tokens = _tokenize_for_lm(sentence)
        if tokens:
            counts.add_sequence(tokens)
    return counts


@lru_cache(maxsize=4)
def build_topic_lm(sf_dir: str, order: int = DEFAULT_ORDER) -> StupidBackoffLM:
    """Train the deterministic topic LM (stupid-backoff) for a scale dir.

    Backoff scoring is what gives the prioritizer a usable spread: seen
    topic n-grams -> low perplexity (HIGH bucket), partially-noisy pages
    -> MEDIUM, all-OOV pages -> the ``ud`` floor -> NORMAL.

    The trained model artifact is cached on disk next to the synthetic
    pages table (reference parity: ARPA / index artifact reuse,
    ``LanguageModelHelper.java:208-214``) - content is a pure function
    of (sf_dir, order), written atomically.
    """
    import os
    import pickle
    import tempfile
    from pathlib import Path

    from ..sources.pages import pages_path

    artifact = Path(pages_path(sf_dir)).parent / ("lm_order%d.pkl" % order)
    if artifact.exists():
        with open(artifact, "rb") as f:
            return pickle.load(f)
    counts = build_topic_counts(sf_dir, order)
    lm = freeze_lm(StupidBackoffLM(counts))  # packed-int keys, cheap unpickle
    fd, tmp = tempfile.mkstemp(dir=artifact.parent, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        pickle.dump(lm, f)
    os.replace(tmp, artifact)
    return lm


@lru_cache(maxsize=4)
def build_topic_lm_laplace(sf_dir: str, order: int = DEFAULT_ORDER) -> LaplaceSmoothedLM:
    """Laplace variant of the topic LM (alternate scorer, F14)."""
    base = CountingLM(order)
    for sentence in iter_training_sentences(sf_dir):
        tokens = _tokenize_for_lm(sentence)
        for ng in ngram_mod.ngram_sequence(tokens, order, boundary_mode=0):
            base.add_ngram(ng)
    return LaplaceSmoothedLM(base)


@lru_cache(maxsize=4)
def build_topic_lm_kn(sf_dir: str, order: int = DEFAULT_ORDER):
    """Kneser-Ney variant of the topic LM (F16)."""
    from .kneserney import build_kneser_ney

    return build_kneser_ney(build_topic_counts(sf_dir, order))


@lru_cache(maxsize=16)
def build_topic_lm_knfamily(sf_dir: str, order: int, scorer: str):
    """Recursive/modified KN family of the topic LM (F16 variants:
    ``KneserNeyLMRecursive.java``, ``ModifiedKneserNeyLMRecursive.java``,
    ``PoptKneserNeyLMRecursive.java``, ``OneBackoffKneserNeyLM.java``)."""
    from .knrecursive import (
        build_kn_recursive,
        build_modified_kn,
        build_one_backoff_kn,
        build_popt_kn,
    )

    builder = {
        "kneser_ney_recursive": build_kn_recursive,
        "modified_kneser_ney": build_modified_kn,
        "popt_kneser_ney": build_popt_kn,
        "one_backoff_kneser_ney": build_one_backoff_kn,
    }[scorer]
    return builder(build_topic_counts(sf_dir, order))


@lru_cache(maxsize=4)
def build_topic_lm_jm(sf_dir: str, order: int = DEFAULT_ORDER):
    """Jelinek-Mercer interpolated variant of the topic LM."""
    from .jm import build_jelinek_mercer

    return build_jelinek_mercer(build_topic_counts(sf_dir, order))


def disk_lm_artifact(sf_dir: str, order: int = DEFAULT_ORDER,
                     num_buckets: int = 64) -> str:
    """Build (once per sf_dir/order) the sharded disk LM artifact for
    the topic training corpus - the Ray-native equivalent of the
    reference's Lucene index directory (``CountingStringLM.java:58-159``:
    the index IS the model).  The bucket files are written DISTRIBUTED
    by :func:`~.diskserve.write_lm_artifact`; the driver folds only the
    tiny count-of-counts manifest.  Content is a pure function of
    (sf_dir, order); atomic directory rename."""
    import os
    import tempfile
    from pathlib import Path

    import ray.data

    from ..sources.pages import pages_path
    from .build import ngram_index
    from .diskserve import write_lm_artifact

    out = Path(pages_path(sf_dir)).parent / ("disklm_order%d" % order)
    if out.exists():
        return str(out)
    # fixture-scale corpus Dataset: one row per training sentence (at
    # crawl scale this is documents -> flat_map(split_sentences) over
    # the corpus parquet; the artifact WRITE is distributed either way)
    sentences = [{"text": s} for s in iter_training_sentences(sf_dir)]
    ds = ray.data.from_items(sentences)

    def one_sentence(text: str) -> list[list[str]]:
        toks = _tokenize_for_lm(text)
        return [toks] if toks else []

    idx = ngram_index(ds, order, tokenizer=one_sentence)
    tmp = tempfile.mkdtemp(dir=out.parent, prefix=".tmp_disklm_")
    try:
        write_lm_artifact(idx, order, tmp, num_buckets=num_buckets)
        os.replace(tmp, out)
    except Exception:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return str(out)


def build_scorer_lm(sf_dir: str, order: int = DEFAULT_ORDER, scorer: str = "stupid_backoff"):
    """Resolve a crawl scorer LM by registry name."""
    if scorer == "stupid_backoff":
        return build_topic_lm(sf_dir, order)
    if scorer == "kneser_ney":
        return build_topic_lm_kn(sf_dir, order)
    if scorer in ("kneser_ney_disk", "stupid_backoff_disk"):
        # disk-backed serving: the broadcast object is just the artifact
        # path + LRU config; every scorer actor pages its own buckets in
        from .diskserve import load_disk_lm

        return load_disk_lm(
            disk_lm_artifact(sf_dir, order),
            scorer.removesuffix("_disk"),
        )
    if scorer == "laplace":
        return build_topic_lm_laplace(sf_dir, order)
    if scorer == "jelinek_mercer":
        return build_topic_lm_jm(sf_dir, order)
    if scorer in ("kneser_ney_recursive", "modified_kneser_ney",
                  "popt_kneser_ney", "one_backoff_kneser_ney"):
        return build_topic_lm_knfamily(sf_dir, order, scorer)
    if scorer == "arpa":
        # the disk-artifact path the reference takes (readFromArpa,
        # LanguageModelHelper.java:190-205): export the topic LM as
        # .arpa.gz once, score from the loaded backoff tables
        from .arpa import export_topic_lm_arpa, read_arpa

        return read_arpa(export_topic_lm_arpa(sf_dir, order))
    raise KeyError("unknown scorer %r" % scorer)


OOVREF_DOC_MOD = 6  # doc_id % 6 == 0 -> oov-reference-LM training doc


@lru_cache(maxsize=4)
def build_oovref_lm(sf_dir: str, order: int = DEFAULT_ORDER) -> StupidBackoffLM:
    """J5 ``--oovreflm``: a SECOND reference LM trained on a different
    deterministic page subset (``doc_id % 6 == 0``, no vocab inflation)
    so its vocabulary genuinely differs from the scorer LM's - OOV
    accounting against it is a real membership test
    (``PerpDoc.java:141-150,255-262``)."""
    from ..sources.pages import pages_path

    pages = pq.read_table(pages_path(sf_dir), columns=["url", "text"])
    counts = NgramCounts(order)
    for url, text in zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()):
        doc_id = _doc_id_from_url(url)
        if doc_id is None or doc_id % OOVREF_DOC_MOD != 0:
            continue
        for sentence in training_sentences_from_text(text):
            tokens = _tokenize_for_lm(sentence)
            if tokens:
                counts.add_sequence(tokens)
    return freeze_lm(StupidBackoffLM(counts))


def build_lm_from_text_dir(text_dir: str, order: int = DEFAULT_ORDER) -> StupidBackoffLM:
    """S9 LM-corpus reader: train from a directory of ``.txt`` files, one
    sentence per line (``LanguageModelHelper.createBerkelyLmFromTxtFilesInDirectory``,
    ``lt.lm/.../LanguageModelHelper.java:207-254``) - expressed as
    ``ray.data.read_text`` -> distributed token streams folded into counts."""
    import ray.data

    ds = ray.data.read_text(text_dir)
    counts = NgramCounts(order)
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for line in batch.column("text").to_pylist():
            tokens = _tokenize_for_lm(line)
            if tokens:
                counts.add_sequence(tokens)
    return freeze_lm(StupidBackoffLM(counts))


_lm_refs: dict[tuple[str, int], object] = {}


def topic_lm_ref(sf_dir: str, order: int = DEFAULT_ORDER, scorer: str = "stupid_backoff"):
    """``ray.put`` the trained LM once per (sf_dir, order, scorer);
    return the ref.  Scorer actors ``ray.get`` this in ``__init__`` -
    broadcast once through the object store, never per batch."""
    import ray

    key = (sf_dir, order, scorer)
    if key not in _lm_refs:
        _lm_refs[key] = ray.put(build_scorer_lm(sf_dir, order, scorer))
    return _lm_refs[key]
