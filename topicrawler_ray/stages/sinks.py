"""Corpus writer stages (S6-S8) - Dataset transforms mirroring the
reference TSV writers as Parquet-able columns.

* ``SentenceWriter`` (``lt.ltbot/.../writer/SentenceWriter.java:173-233``):
  one row per sentence ``time, sentence, url, sent_idx, perp``;
  sentences via SentenceMaker (minLength=2, cxml:205-211); skip
  revisits (first-write-wins per URL - fixture pages are unique) and
  docs with no sentences.
* ``PlainTextDocumentWriter``
  (``lt.ltbot/.../writer/PlainTextDocumentWriter.java:149-210``): one row
  per document ``time, perp, text_escaped, url`` with ``\\t -> \\\\t``,
  ``\\r`` stripped, ``\\n -> \\\\n`` (:202); skip empty text.
* ``DecesiveValueLogger`` (``lt.ltbot/.../postprocessor/DecesiveValueLogger.java:107-125``):
  the decision-log line string.

Timestamps derive from ``warc_ts`` (deterministic stand-in for the
reference's wall clock) formatted ISO-8601-UTC with milliseconds
(``lt.utilities/.../TimeUtils.java:32-38``).  Rolling 100MB output files
are replaced by Ray block-sized parquet part files.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from ..functions.sentencemaker import get_sentences


def iso8601_utc(ts_us: int) -> str:
    """``TimeUtils.get_ISO_8601_UTC``: yyyy-MM-dd'T'HH:mm:ss.SSS'Z'."""
    dt = _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + "%03dZ" % (dt.microsecond // 1000)


def escape_plaintext(text: str) -> str:
    """``PlainTextDocumentWriter.java:202``: tab/newline escaping."""
    return text.replace("\t", "\\t").replace("\r", "").replace("\n", "\\n")


def sentences_batch(batch: pa.Table) -> pa.Table:
    """flat-map scored pages -> sentence rows (SentenceWriter layout)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("clean_text").to_pylist()
    perps = batch.column("perp_str").to_pylist()
    ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    o_time, o_sent, o_url, o_idx, o_perp = [], [], [], [], []
    for url, text, perp_str, t in zip(urls, texts, perps, ts):
        if not text:
            continue
        tstr = iso8601_utc(t)
        for i, sentence in enumerate(get_sentences(text, min_length=2)):
            o_time.append(tstr)
            o_sent.append(sentence)
            o_url.append(url)
            o_idx.append(i)
            o_perp.append(perp_str)
    return pa.table(
        {
            "time": pa.array(o_time, pa.string()),
            "sentence": pa.array(o_sent, pa.string()),
            "url": pa.array(o_url, pa.string()),
            "sent_idx": pa.array(o_idx, pa.int32()),
            "perp": pa.array(o_perp, pa.string()),
        }
    )


def breakiter_sentences_batch(batch: pa.Table) -> pa.Table:
    """flat-map extracted pages -> UAX #29 sentence rows - the
    ``BreakIteratorStringProvider`` (``lt.lm/.../service/
    BreakIteratorStringProvider.java:66-103``) sentence/token view as a
    Dataset transform: ``url, sent_idx, sentence, n_tokens``."""
    from ..functions.breakiter import provider_split_sentences, provider_tokenize

    urls = batch.column("url").to_pylist()
    texts = batch.column("clean_text").to_pylist()
    o_url, o_idx, o_sent, o_ntok = [], [], [], []
    for url, text in zip(urls, texts):
        if not text:
            continue
        for i, sentence in enumerate(provider_split_sentences(text)):
            o_url.append(url)
            o_idx.append(i)
            o_sent.append(sentence)
            o_ntok.append(len(provider_tokenize(sentence)))
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "sent_idx": pa.array(o_idx, pa.int32()),
            "sentence": pa.array(o_sent, pa.string()),
            "n_tokens": pa.array(o_ntok, pa.int64()),
        }
    )


def plaintext_batch(batch: pa.Table) -> pa.Table:
    """scored pages -> plaintext-corpus rows (PlainTextDocumentWriter)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("clean_text").to_pylist()
    perps = batch.column("perp_str").to_pylist()
    ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    o_time, o_perp, o_text, o_url = [], [], [], []
    for url, text, perp_str, t in zip(urls, texts, perps, ts):
        if not text:  # skip empty documents (:171-173)
            continue
        o_time.append(iso8601_utc(t))
        o_perp.append(perp_str)
        o_text.append(escape_plaintext(text))
        o_url.append(url)
    return pa.table(
        {
            "time": pa.array(o_time, pa.string()),
            "perp": pa.array(o_perp, pa.string()),
            "text_escaped": pa.array(o_text, pa.large_string()),
            "url": pa.array(o_url, pa.string()),
        }
    )


def decision_log_line(
    ts_us: int,
    perp_str: str,
    directive: int,
    assigned_directive: int | str,
    precedence: int,
    assigned_precedence: int | str,
    url: str,
    abbr_text: str,
) -> str:
    """``DecesiveValueLogger.getLogString`` format (:125)."""
    return "%s\t%s\t%s(%s)\t%s(%s)\t%s\t[%-50s]" % (
        iso8601_utc(ts_us),
        perp_str if perp_str else "null",
        directive,
        assigned_directive,
        precedence,
        assigned_precedence,
        url,
        abbr_text if abbr_text else "_",
    )
