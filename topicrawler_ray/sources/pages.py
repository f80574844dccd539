"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Input shape per BASELINE.json ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Pages are derived deterministically from ``{sf_dir}/documents.parquet``
(seeded driver data, read-only) - one page per document plus one
``/robots.txt`` page per host - so the DuckDB oracle can reconstruct the
same rows from the pre-registered ``documents`` view.

The ``text`` column is the *extraction oracle*: the byte-exact expected
output of the reference composite ``clean_min -> jsoup text -> clean_min``
then ``String.trim()``
(``TextExtractor.getCleanedUtf8PlainText``, ``lt.ltbot/.../text/TextExtractor.java:80-85``;
``JSoupTextExtractor.java:34-54``).  It is derived *analytically* from the
page template (hand-derived whitespace algebra, see ``_expected_text``),
NOT by running our extractor - the pytest byte-identity check compares the
two independent derivations.

Host skew: host 0 is a deliberate mega-host holding ~40% of all pages
(tests politeness batching + salting).  Link graph, noise injection,
empty pages, dead links and robots-blocked links are all deterministic
functions of ``doc_id``.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1388534400_000_000  # 2014-01-01T00:00:00Z in microseconds

# deterministic knobs (documented spec of the fixture universe)
MEGA_HOST_FRACTION_MOD = 10  # doc_id % 10 < 4  -> host 0  (~40%)
MEGA_HOST_FRACTION_LT = 4
NOISE_MOD = 5  # doc_id % 5 == 1 -> 30% noise words; == 2 -> all-noise para
EMPTY_MOD = 11  # doc_id % 11 == 7 -> empty page (empty extraction)
DEAD_LINK_MOD = 17  # doc_id % 17 == 3 -> extra dead link /missing/m{i}
BLOCKED_LINK_MOD = 13  # doc_id % 13 == 2 -> extra link /blocked/b{i}
ROBOTS_DISALLOW_HOST_MOD = 5  # host % 5 == 3 -> robots disallows /blocked/

_KNUTH = 2654435761


def n_hosts_for(n_docs: int) -> int:
    return max(3, n_docs // 50)


def host_of(doc_id: int, n_hosts: int) -> int:
    if doc_id % MEGA_HOST_FRACTION_MOD < MEGA_HOST_FRACTION_LT:
        return 0
    return 1 + (doc_id * _KNUTH) % (n_hosts - 1)


def url_of(doc_id: int, n_hosts: int) -> str:
    return "http://host%d.example/p%d" % (host_of(doc_id, n_hosts), doc_id)


def robots_url(host: int) -> str:
    return "http://host%d.example/robots.txt" % host


def link_targets(doc_id: int, n_docs: int) -> list[int]:
    """Three deterministic outlink targets per page."""
    return [
        (doc_id * 7 + 1) % n_docs,
        (doc_id * 13 + 5) % n_docs,
        (doc_id * 31 + 17) % n_docs,
    ]


def noise_words(doc_id: int, k: int) -> list[str]:
    """OOV-guaranteed letters-only tokens, deterministic per doc (digits
    would be filtered from the scorer's token stream at level 5)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for j in range(k):
        n = (doc_id * _KNUTH + j * 40503) & 0xFFFFFFF
        w = []
        while True:
            w.append(letters[n % 26])
            n //= 26
            if n == 0:
                break
        out.append("zq" + "".join(w))
    return out


DIRTY_MOD = 23  # doc_id % 23 == 5 -> BOM+U+FFFD injected into paragraph 1
EXT_DIRTY_MOD = 29  # doc_id % 29 == 11 -> Ext-only dirty char U+20A8 in p2
ENTITY_MOD = 31  # doc_id % 31 == 13 -> HTML entities in p2
MESSY_LINK_MOD = 37  # doc_id % 37 == 17 -> non-canonical duplicate link
LATIN1_MOD = 43  # doc_id % 43 == 21 -> ISO-8859-1 page w/ <meta charset>
BAD_CHARSET_MOD = 47  # doc_id % 47 == 31 -> unresolvable charset name
BAD_CHARSET_NAME = "x-no-such-charset-1"
CRAWL_DELAY_HOST_MOD = 7  # host % 7 == 2 -> robots Crawl-delay: 0.3
CRAWL_DELAY_S = 0.3  # -> politeness period of 3 waves (100ms slots)
FIXTURE_VERSION = 3  # bump when the page grammar changes (invalidates /tmp)


def _paragraphs(
    doc_id: int, words: list[str], charset_extra: bool = False
) -> tuple[str, str, str, str]:
    """Split doc words into two sentence-terminated paragraphs, with
    deterministic noise injection for perplexity-bucket diversity.

    Returns ``(p1_html, p1_expected, p2_html, p2_expected)``: pages hit
    by ``DIRTY_MOD`` carry U+FEFF / U+FFFD in the html (expected carries
    the Min cleaner's U+00BF); ``ENTITY_MOD`` pages carry HTML entities
    (expected carries the decoded chars).
    """
    half = max(1, len(words) // 2)
    p1w = words[:half]
    p2w = list(words[half:]) or ["end"]
    m = doc_id % NOISE_MOD
    if m == 1:  # second paragraph all noise (~50% of doc) -> MEDIUM bucket
        p2w = noise_words(doc_id, max(4, len(p2w)))
    elif m == 2:  # both paragraphs noise -> NORMAL bucket (perp > 5e3)
        p1w = noise_words(doc_id + 1_000_000, max(4, len(p1w)))
        p2w = noise_words(doc_id, max(4, len(p2w)))
    p1 = " ".join(p1w) + "."
    p1_html, p1_expected = p1, p1
    if doc_id % DIRTY_MOD == 5 and p1w:
        p1_html = "\ufeff" + p1 + "\ufffd"
        p1_expected = "\u00bf" + p1 + "\u00bf"
    p2 = " ".join(p2w) + "."
    if doc_id % EXT_DIRTY_MOD == 11 and p2w:
        # Ext-only dirty char (U+20A8 rupee sign): the writer/conformance
        # path (UTF8CleanerMin) KEEPS it, the scorer path (UTF8CleanerExt,
        # cxml:216) replaces it with U+00BF - the fixture that separates
        # the two cleaner pipelines
        p2 = p2 + " \u20a8"
    p2_html, p2_expected = p2, p2
    if doc_id % ENTITY_MOD == 13:
        # named + numeric entities decode during parsing (Jsoup semantics)
        p2_html = p2 + " K&uuml;che &amp; Co &#8211; gut."
        p2_expected = p2 + " K\u00fcche & Co \u2013 gut."
    if charset_extra:
        # latin-1-representable non-ASCII words: these bytes only decode
        # correctly when the extractor honors the <meta charset> (M1)
        p2_html = p2_html + " caf\u00e9 entr\u00e9e."
        p2_expected = p2_expected + " caf\u00e9 entr\u00e9e."
    return p1_html, p1_expected, p2_html, p2_expected


def _anchor_cell(doc_id: int, n_docs: int, n_hosts: int) -> tuple[str, str, list[str]]:
    """(anchor_html, anchor_text_in_extraction, out_urls).

    Anchor labels are WORD_WITH_NUMBER tokens (``l0``...) so the scorer's
    level-5 token filter drops them from the LM stream - but they are part
    of the byte-exact extracted text.
    """
    my_host = host_of(doc_id, n_hosts)
    parts = []
    texts = []
    urls = []
    for i, tgt in enumerate(link_targets(doc_id, n_docs)):
        tgt_host = host_of(tgt, n_hosts)
        if tgt_host == my_host:
            href = "/p%d" % tgt
        else:
            href = "http://host%d.example/p%d" % (tgt_host, tgt)
        parts.append('<a href="%s">l%d</a>' % (href, i))
        texts.append("l%d" % i)
        urls.append("http://host%d.example/p%d" % (tgt_host, tgt))
    if doc_id % DEAD_LINK_MOD == 3:
        parts.append('<a href="/missing/m%d">l3</a>' % doc_id)
        texts.append("l3")
        urls.append("http://host%d.example/missing/m%d" % (my_host, doc_id))
    if doc_id % BLOCKED_LINK_MOD == 2:
        parts.append('<a href="/blocked/b%d">l4</a>' % doc_id)
        texts.append("l4")
        urls.append("http://host%d.example/blocked/b%d" % (my_host, doc_id))
    if doc_id % MESSY_LINK_MOD == 17:
        # non-canonical duplicate of the first target: uppercase scheme +
        # host, default port, fragment - canonicalization (M14) folds it
        # onto the first link, the seen filter dedups it
        t0 = link_targets(doc_id, n_docs)[0]
        t0_host = host_of(t0, n_hosts)
        parts.append(
            '<a href="HTTP://HOST%d.EXAMPLE:80/p%d#frag">l5</a>' % (t0_host, t0)
        )
        texts.append("l5")
        urls.append("http://host%d.example/p%d" % (t0_host, t0))
    return " ".join(parts), " ".join(texts), urls


def _page_html(
    doc_id: int,
    words: list[str],
    n_docs: int,
    n_hosts: int,
    meta_charset: str | None = None,
    charset_extra: bool = False,
) -> str:
    if doc_id % EMPTY_MOD == 7:
        # empty extraction (perp -> -1) but real outlinks: children get a
        # via perp of -1 and exercise the prioritizer's REJECT path; the
        # empty anchors contribute no text
        t1, t2 = link_targets(doc_id, n_docs)[:2]
        return (
            "<html><head><title></title></head>\n"
            '<body><a href="http://host%d.example/p%d"></a>'
            '<a href="http://host%d.example/p%d"></a></body></html>'
            % (host_of(t1, n_hosts), t1, host_of(t2, n_hosts), t2)
        )
    host = host_of(doc_id, n_hosts)
    title = "Doc %d host%d" % (doc_id, host)
    p1, _, p2, _ = _paragraphs(doc_id, words, charset_extra)
    anchors, _, _ = _anchor_cell(doc_id, n_docs, n_hosts)
    home = "http://host0.example/p0"
    # <meta> is a void block tag contributing no text and no separator
    # (accumulator is still empty when it is entered)
    meta = '<meta charset="%s">' % meta_charset if meta_charset else ""
    return (
        "<html><head>%s<title>%s</title></head>\n"
        "<body>\n"
        '<div class="nav">Home | <a href="%s">start</a></div>\n'
        "<p>%s</p>\n"
        "<p>%s</p>\n"
        '<div class="links">%s</div>\n'
        '<div class="footer">&copy; 2014 host%d.example</div>\n'
        "</body></html>" % (meta, title, home, p1, p2, anchors, host)
    )


def _expected_text(
    doc_id: int,
    words: list[str],
    n_docs: int,
    n_hosts: int,
    charset_extra: bool = False,
) -> str:
    """Analytic derivation of the extraction composite for the template.

    Whitespace algebra (hand-derived, verified char-for-char in tests):
    each ``\\n`` and each ``</p>`` contributes a ``br2nl`` marker; Jsoup
    block-entry adds one space when the accumulator doesn't end in one;
    the final ``(?m)\\s+$`` pass eats blank-line newlines and the space
    line between title and nav.
    """
    if doc_id % EMPTY_MOD == 7:
        return ""
    host = host_of(doc_id, n_hosts)
    title = "Doc %d host%d" % (doc_id, host)
    _, p1, _, p2 = _paragraphs(doc_id, words, charset_extra)
    _, anchor_text, _ = _anchor_cell(doc_id, n_docs, n_hosts)
    return (
        "%s\n Home | start\n %s\n %s\n %s\n © 2014 host%d.example"
        % (title, p1, p2, anchor_text, host)
    )


def robots_body(host: int) -> str:
    delay = (
        "Crawl-delay: %g\n" % CRAWL_DELAY_S
        if host % CRAWL_DELAY_HOST_MOD == 2
        else ""
    )
    if host % ROBOTS_DISALLOW_HOST_MOD == 3:
        return "User-agent: *\nDisallow: /blocked/\n" + delay
    return "User-agent: *\nDisallow:\n" + delay


def _build_page(
    doc_id: int, words: list[str], n_docs: int, n_hosts: int
) -> tuple[bytes, str]:
    """(html_bytes, expected_extraction) for one page, including the
    charset variants (M1: charset-aware decode).

    * ``LATIN1_MOD`` pages are ENCODED ISO-8859-1 with an in-band
      ``<meta charset>`` and latin-1-only words appended - decoding them
      as UTF-8 would yield U+FFFD mojibake, so byte-identity proves the
      extractor honors the declaration.  Pages whose content is not
      latin-1-representable (dirty-char fixtures, non-latin scripts)
      deterministically fall back to the plain UTF-8 variant.
    * ``BAD_CHARSET_MOD`` pages declare an unresolvable charset: the
      expected text is the reference's error string
      (``TextExtractor.java:57-66``) run through the extraction
      composite (the trailing newline is trimmed).
    """
    if doc_id % EMPTY_MOD == 7:
        return _page_html(doc_id, words, n_docs, n_hosts).encode("utf-8"), ""
    if doc_id % LATIN1_MOD == 21:
        cand = _page_html(
            doc_id, words, n_docs, n_hosts,
            meta_charset="ISO-8859-1", charset_extra=True,
        )
        try:
            return (
                cand.encode("iso-8859-1"),
                _expected_text(doc_id, words, n_docs, n_hosts, charset_extra=True),
            )
        except UnicodeEncodeError:
            pass  # not latin-1-representable -> plain UTF-8 page below
    elif doc_id % BAD_CHARSET_MOD == 31:
        html = _page_html(
            doc_id, words, n_docs, n_hosts, meta_charset=BAD_CHARSET_NAME
        )
        err = (
            "Failed to get content of URI: '%s'. "
            "(1 UnsupportedCharsetException:%s)\n"
            % (url_of(doc_id, n_hosts), BAD_CHARSET_NAME)
        )
        return html.encode("utf-8"), err[:-1]
    return (
        _page_html(doc_id, words, n_docs, n_hosts).encode("utf-8"),
        _expected_text(doc_id, words, n_docs, n_hosts),
    )


def build_pages_table(sf_dir: str) -> pa.Table:
    """Build the deterministic pages table for a testdata scale dir."""
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    n_docs = len(doc_ids)
    n_hosts = n_hosts_for(n_docs)

    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    out_texts: list[str] = []
    out_langs: list[str] = []

    # robots pages first (earliest timestamps)
    for h in range(n_hosts):
        urls.append(robots_url(h))
        ts.append(EPOCH_US - 1_000_000_000 + h * 1_000_000)
        body = robots_body(h)
        htmls.append(body.encode("utf-8"))
        out_texts.append("")
        out_langs.append("xx")

    for doc_id, text, lang in zip(doc_ids, texts, langs):
        words = text.split(" ")
        urls.append(url_of(doc_id, n_hosts))
        ts.append(EPOCH_US + doc_id * 1_000_000)
        html_bytes, expected = _build_page(doc_id, words, n_docs, n_hosts)
        htmls.append(html_bytes)
        out_texts.append(expected)
        out_langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def pages_path(sf_dir: str) -> str:
    """Materialise the pages table under /tmp once; return the parquet path.

    Written atomically (temp file + rename) so concurrent callers race
    safely; content is a pure function of ``sf_dir``.
    """
    name = Path(sf_dir).name or "sf"
    out_dir = (
        Path(tempfile.gettempdir())
        / ("topicrawler_ray_pages_v%d" % FIXTURE_VERSION)
        / name
    )
    out = out_dir / "pages.parquet"
    if not out.exists():
        out_dir.mkdir(parents=True, exist_ok=True)
        table = build_pages_table(sf_dir)
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(table, tmp, row_group_size=4096)
        os.replace(tmp, out)
    return str(out)


NUM_URL_BUCKETS = 64  # url-hash buckets of the bucketed pages layout


def pages_bucketed_dir(sf_dir: str, num_buckets: int = NUM_URL_BUCKETS) -> str:
    """Materialise the pages table hash-partitioned by
    ``murmur3(url) % num_buckets`` (one parquet per bucket) - the layout
    the sharded PageStore actors prune against (SCALE.md fetch-sim
    path).  Atomic directory rename; derived from the single-file table."""
    from ..functions.hashing import url_hash64

    src = Path(pages_path(sf_dir))
    out_dir = src.parent / "pages_bucketed"
    if out_dir.exists():
        return str(out_dir)
    table = pq.read_table(src)
    buckets = np.array(
        [url_hash64(u) % num_buckets for u in table.column("url").to_pylist()],
        dtype=np.int64,
    )
    tmp = Path(tempfile.mkdtemp(dir=src.parent, prefix=".tmp_buckets_"))
    try:
        for b in range(num_buckets):
            idx = np.nonzero(buckets == b)[0]
            pq.write_table(table.take(idx), tmp / ("bucket=%02d.parquet" % b))
        os.replace(tmp, out_dir)
    except Exception:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return str(out_dir)


NUM_HOST_BUCKETS = 64  # host-hash buckets of the host-co-partitioned layout


def pages_host_bucketed_dir(sf_dir: str, num_buckets: int = NUM_HOST_BUCKETS) -> str:
    """Materialise the pages table hash-partitioned by
    ``shard_of_host(host) % num_buckets`` (one parquet per host bucket).

    This is the frontier-co-partitioned archive layout: a frontier shard
    ``rank`` of ``world`` (world | num_buckets) owns exactly the buckets
    ``b % world == rank`` for ITS OWN hosts, so the politeness wave loop
    can point-read every page it fetches locally - no cross-actor hop on
    the wave critical path, and each shard's point-read index covers only
    ``1/world`` of the URL space (the metadata-scale requirement at
    10^10 URLs).  Classic web-archive practice: partition the crawl
    archive by host so politeness, robots state and page payloads
    co-locate."""
    from ..functions.hashing import url_hash64
    from ..functions.urls import host_of_url

    src = Path(pages_path(sf_dir))
    out_dir = src.parent / "pages_hostbucketed"
    if out_dir.exists():
        return str(out_dir)
    table = pq.read_table(src)
    buckets = np.array(
        [
            url_hash64("host:" + host_of_url(u)) % num_buckets
            for u in table.column("url").to_pylist()
        ],
        dtype=np.int64,
    )
    tmp = Path(tempfile.mkdtemp(dir=src.parent, prefix=".tmp_hostbuckets_"))
    try:
        for b in range(num_buckets):
            idx = np.nonzero(buckets == b)[0]
            pq.write_table(
                table.take(idx), tmp / ("hostbucket=%02d.parquet" % b)
            )
        os.replace(tmp, out_dir)
    except Exception:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return str(out_dir)


def strip_schema_metadata(ds):
    """Drop parquet-embedded schema metadata (the pandas key) from every
    block.  pyarrow schemas WITH metadata are unhashable (hashing the
    dict raises), which defeats Ray's HashShuffleAggregator schema
    deduplication and spams ``Failed to hash the schemas`` during every
    join/groupby over parquet-fed blocks.  O(1) per block (metadata
    pointer swap) and fuses with the read task."""
    import pyarrow as _pa

    def _strip(t: "_pa.Table") -> "_pa.Table":
        if t.schema.metadata:
            return t.replace_schema_metadata(None)
        return t

    return ds.map_batches(_strip, batch_format="pyarrow")


def _strip_block(t):
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def read_parquet_clean(paths, *, columns=None, override_num_blocks=None, **kwargs):
    """``ray.data.read_parquet`` with schema metadata stripped INSIDE the
    read task (``_block_udf``).

    Driver-written fixture parquet (events/documents/embeddings/...)
    embeds the ``b'pandas'`` schema metadata key; blocks carrying it
    defeat Ray's schema-hash deduplication in every shuffle AND in the
    read task's own SplitBlocks step (``Failed to hash the schemas``
    warning storms), so a downstream ``map_batches`` strip is applied
    too late.  Falls back to read+strip if the datasource signature
    changes.  All table reads outside :func:`read_pages` go through
    this wrapper.
    """
    import ray.data

    try:
        import pyarrow.parquet as _pq
        from ray.data._internal.datasource.parquet_datasource import (
            ParquetDatasource,
        )

        # also hand the datasource a stripped schema: the read-plan
        # metadata path (Dataset.count() etc.) unifies the RAW file
        # schemas before any _block_udf runs, and the embedded pandas
        # key would still trip the schema-hash dedup there
        import os as _os

        import pyarrow as _pa

        if isinstance(paths, (list, tuple)):
            probe = list(paths)
        else:
            probe = [paths]
        # a directory (write_parquet output) is probed via its files so
        # the in-task strip fast path covers the most common production
        # layout instead of silently falling back to the late strip
        if len(probe) == 1 and _os.path.isdir(probe[0]):
            probe = sorted(
                _os.path.join(probe[0], f)
                for f in _os.listdir(probe[0])
                if f.endswith(".parquet")
            )
            if not probe:
                raise OSError("no .parquet files under directory")
        schema = _pq.read_schema(probe[0])
        # the plan schema is forced onto EVERY file, so guard the
        # uniform-schema assumption (the write_parquet invariant) by
        # probing the last file too; mixed layouts take the fallback
        if len(probe) > 1 and _pq.read_schema(probe[-1]).remove_metadata() != schema.remove_metadata():
            raise TypeError("non-uniform file schemas")
        if columns is not None:
            schema = _pa.schema([schema.field(c) for c in columns])
        schema = schema.remove_metadata()
        ds = ray.data.read_datasource(
            ParquetDatasource(
                paths, columns=columns, schema=schema, _block_udf=_strip_block
            ),
            override_num_blocks=override_num_blocks,
            **kwargs,
        )
        return ds
    except (ImportError, TypeError, OSError, KeyError):
        rp_kwargs = dict(kwargs)
        if columns is not None:
            rp_kwargs["columns"] = columns
        if override_num_blocks is not None:
            rp_kwargs["override_num_blocks"] = override_num_blocks
        return strip_schema_metadata(ray.data.read_parquet(paths, **rp_kwargs))


#: default projection for pipeline reads: every consumer recomputes the
#: extraction from ``html``, so the stored analytic ``text`` column (as
#: large as the corpus itself - it exists for the DuckDB oracles) never
#: leaves storage unless explicitly requested.
PAGES_PIPELINE_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(sf_dir: str, num_blocks: int | None = None,
               columns: list[str] | None = None):
    """Ray Dataset over the synthetic pages parquet (lazy, streaming).

    ``num_blocks`` splits the single fixture file so downstream actor
    pools get enough tasks to parallelise (a real 100TB input is already
    thousands of files and needs no override).  ``columns`` defaults to
    :data:`PAGES_PIPELINE_COLUMNS` (prune-at-the-read discipline); pass
    an explicit list to read more or fewer.
    """
    import ray.data

    cols = PAGES_PIPELINE_COLUMNS if columns is None else columns
    if num_blocks:
        return ray.data.read_parquet(
            pages_path(sf_dir), columns=cols, override_num_blocks=num_blocks
        )
    return ray.data.read_parquet(pages_path(sf_dir), columns=cols)
