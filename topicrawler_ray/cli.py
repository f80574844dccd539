"""Command-line entry points - suitable for ``ray job submit``.

On a real cluster::

    ray job submit --working-dir . -- python -m topicrawler_ray.cli crawl \
        --sf-dir /data/sfX --out /data/crawl_out --checkpoint /data/ckpt

In this sandbox Ray runs local-mode; the CLI owns its Ray session
(``ray.init``/``ray.shutdown``) - library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys



def _rp_clean(*args, **kwargs):
    """Metadata-stripped parquet read (schema-hash dedup friendly)."""
    from .sources.pages import read_parquet_clean

    return read_parquet_clean(*args, **kwargs)

def _init_ray(num_cpus: int | None) -> None:
    import ray

    kwargs = dict(
        include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR"
    )
    if not ray.is_initialized():
        # on a cluster (ray job submit) RAY_ADDRESS is auto; locally force
        # a local head with the requested CPU budget
        if os.environ.get("RAY_ADDRESS", "local") == "local":
            kwargs["address"] = "local"
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    from .config import CrawlConfig
    from .pipelines.crawl import RayCrawlEngine

    _init_ray(args.num_cpus)
    import pyarrow.parquet as pq
    import ray

    cfg = CrawlConfig.sized(
        args.num_cpus or 8,
        checkpoint_dir=args.checkpoint,
        max_waves=args.max_waves,
        scorer=args.scorer,
        seen_filter_kind=args.seen_filter,
    )
    engine = RayCrawlEngine(args.sf_dir, cfg)
    result = engine.resume_run() if args.resume else engine.run()
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        pq.write_table(result.log, os.path.join(args.out, "crawl_log.parquet"))
    print(json.dumps(result.stats, default=str))
    ray.shutdown()
    return 0


def cmd_score(args) -> int:
    from .pipelines.flagship import scored_pages

    _init_ray(args.num_cpus)
    import ray

    ds = scored_pages(args.sf_dir, concurrency=max(2, (args.num_cpus or 8) // 2))
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        print(json.dumps({"rows": ds.count()}))
    ray.shutdown()
    return 0


def cmd_export_corpus(args) -> int:
    """Extract + score + write sentence/plaintext corpora (S6/S7 sinks)."""
    from .pipelines.export import write_partitioned
    from .pipelines.flagship import scored_pages
    from .stages.sinks import plaintext_batch, sentences_batch

    _init_ray(args.num_cpus)
    import ray

    ds = scored_pages(args.sf_dir, concurrency=max(2, (args.num_cpus or 8) // 2))
    sent = ds.map_batches(sentences_batch, batch_format="pyarrow")
    plain = ds.map_batches(plaintext_batch, batch_format="pyarrow")
    m1 = write_partitioned(sent, os.path.join(args.out, "sentences"), key_column="url")
    m2 = write_partitioned(plain, os.path.join(args.out, "plaintext"), key_column="url")
    print(
        json.dumps(
            {
                "sentences_rows": sum(m["rows"] for m in m1.values()),
                "plaintext_rows": sum(m["rows"] for m in m2.values()),
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Training-data dedup over a parquet table (exact / minhash /
    simhash / ngram-jaccard / embedding), ray-job-submit-able."""
    _init_ray(args.num_cpus)
    import ray
    import ray.data

    ds = _rp_clean(args.input)
    method = args.method
    if method == "exact":
        from .stages.dedup import exact_dedup

        out = exact_dedup(ds, column=args.column, id_column=args.id_column)
    elif method == "minhash":
        from .stages.dedup import minhash_near_dup_pairs

        out = minhash_near_dup_pairs(
            ds, column=args.column, id_column=args.id_column,
            threshold=args.threshold,
        )
    elif method == "simhash":
        from .stages.dedup import simhash_near_dup_pairs

        out = simhash_near_dup_pairs(
            ds, column=args.column, id_column=args.id_column,
            max_hamming=args.max_hamming,
        )
    elif method == "jaccard":
        from .stages.dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(
            ds, threshold=args.threshold, column=args.column,
            id_column=args.id_column,
        )
    elif method == "embedding":
        from .stages.dedup import embedding_near_dup_pairs

        out = embedding_near_dup_pairs(
            ds, threshold=args.threshold, id_column=args.id_column,
            vec_column=args.column, lsh_bits=args.lsh_bits,
        )
    else:
        raise SystemExit("unknown method %r" % method)
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        print(json.dumps({"rows": out.count()}))
    ray.shutdown()
    return 0


def cmd_snapshot(args) -> int:
    """Diff two crawl snapshots (parquet with url + text, or url +
    precomputed digest) into new/gone/changed/same per URL; with
    --schedule, roll the diff up into per-host revisit tiers."""
    _init_ray(args.num_cpus)
    import ray

    from .stages.snapshot import add_digest, revisit_schedule, snapshot_diff

    old = _rp_clean(args.old)
    new = _rp_clean(args.new)
    if args.digest_column:
        import pyarrow as pa

        def _select(out_name):
            def fn(batch):
                return pa.table(
                    {
                        "url": batch.column("url"),
                        out_name: batch.column(args.digest_column),
                    }
                )

            return fn

        a = old.map_batches(_select("digest_a"), batch_format="pyarrow")
        b = new.map_batches(_select("digest_b"), batch_format="pyarrow")
    else:
        a = add_digest(old, text_column=args.text_column, out="digest_a")
        b = add_digest(new, text_column=args.text_column, out="digest_b")
    diff = snapshot_diff(a, b)
    out = revisit_schedule(diff) if args.schedule else diff
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        if args.schedule:
            print(json.dumps({"hosts": out.count()}))
        else:
            counts = {
                r["status"]: r["count()"]
                for r in out.groupby("status").count().take_all()
            }
            print(json.dumps({"rows": sum(counts.values()), "status": counts}))
    ray.shutdown()
    return 0


def cmd_graph(args) -> int:
    """Host-graph analytics over a pages parquet (url + html): extract
    the offsite host graph once, then emit the requested metric —
    pagerank / harmonic / degrees / triangles / kcore / reciprocity —
    as parquet (or a JSON row-count summary to stdout)."""
    _init_ray(args.num_cpus)
    import ray

    from .stages.graph import (
        degrees,
        harmonic_centrality,
        host_edges,
        host_kcore,
        host_reciprocity,
        host_triangles,
        pagerank,
    )

    pages = _rp_clean(args.input, columns=["url", "html"])
    edges = host_edges(pages)
    if args.metric == "pagerank":
        out = pagerank(edges, iterations=args.iterations)
    elif args.metric == "harmonic":
        out = harmonic_centrality(edges)
    elif args.metric == "degrees":
        out = degrees(edges)
    elif args.metric == "triangles":
        out = host_triangles(edges)
    elif args.metric == "kcore":
        out = host_kcore(edges, k=args.k)
    else:  # reciprocity
        out = host_reciprocity(edges)
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "hosts": out.count()}))
    else:
        print(json.dumps({"metric": args.metric, "hosts": out.count()}))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Webtext curation chain over a parquet documents table: exact
    dedup (hash-aggregate) -> quality + gopher -> langid -> gates ->
    token counts; writes curated parquet + prints a JSON summary."""
    _init_ray(args.num_cpus)
    import json as _json

    import ray
    import ray.data

    from .pipelines.curation import curated_docs

    ds = _rp_clean(
        args.input, columns=[args.id_column, args.column]
    )
    n_in = ds.count()
    out = curated_docs(
        ds,
        lang=args.lang,
        min_words=args.min_words,
        min_quality=args.min_quality,
        langid_concurrency=args.concurrency,
    )
    out.write_parquet(args.out)
    n_out = _rp_clean(args.out).count()
    print(_json.dumps({"rows_in": n_in, "rows_curated": n_out, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_ngram_index(args) -> int:
    """J4: build the unified per-ngram index + __sum_ngrams__ artifact."""
    _init_ray(args.num_cpus)
    import ray

    from .lm.build import (
        count_ngrams,
        count_of_counts,
        ngram_index,
        write_sum_ngrams,
    )

    import ray.data

    # prune at the read: the index derives from the text column alone
    ds = _rp_clean(args.input, columns=[args.column])
    idx = ngram_index(ds, args.order, column=args.column, mincount=args.mincount)
    os.makedirs(args.out, exist_ok=True)
    idx.write_parquet(os.path.join(args.out, "ngram_index"))
    stats = count_of_counts(
        count_ngrams(ds, args.order, args.column, args.mincount), args.order
    )
    write_sum_ngrams(stats, os.path.join(args.out, "__sum_ngrams__"))
    print(json.dumps({"out": args.out, "S": stats["S"]}))
    ray.shutdown()
    return 0


def cmd_segment(args) -> int:
    """lt.seg ``Segmenter`` app equivalent: sentence-split + tokenize a
    text file/dir distributed via read_text -> map_batches."""
    _init_ray(args.num_cpus)
    import pyarrow as pa
    import ray

    from .functions.sentences import split_sentences
    from .functions.tokenizer import filtered_and_normalized_tokens

    level_f, level_n = args.filter_level, args.normalize_level

    def segment_batch(batch: pa.Table) -> pa.Table:
        o_line, o_sidx, o_sent, o_tokens = [], [], [], []
        for line in batch.column("text").to_pylist():
            for i, sent in enumerate(split_sentences(line or "")):
                o_line.append(line)
                o_sidx.append(i)
                o_sent.append(sent)
                o_tokens.append(
                    filtered_and_normalized_tokens(sent, level_f, level_n)
                )
        return pa.table(
            {
                "line": pa.array(o_line, pa.large_string()),
                "sent_idx": pa.array(o_sidx, pa.int32()),
                "sentence": pa.array(o_sent, pa.large_string()),
                "tokens": pa.array(o_tokens, pa.list_(pa.string())),
            }
        )

    ds = ray.data.read_text(args.input).map_batches(
        segment_batch, batch_format="pyarrow"
    )
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        print(json.dumps({"sentences": ds.count()}))
    ray.shutdown()
    return 0


def cmd_lm(args) -> int:
    """StartLM REPL parity (non-interactive): per-ngram log10 probs and
    document perplexity for a text (``lt.lm/.../app/StartLM.java:206-249``
    :pn/:ps commands)."""
    from .lm.perplexity import document_perplexity, text_ngrams
    from .lm.train import build_scorer_lm

    lm = build_scorer_lm(args.sf_dir, args.order, args.scorer)
    out = {"order": args.order, "scorer": args.scorer}
    ngrams = text_ngrams(args.text, args.order)
    out["ngrams"] = [
        {"ngram": " ".join(g), "log10p": round(lm.ngram_log10_prob(g), 6)}
        for g in ngrams
    ]
    out["perplexity"] = document_perplexity(lm, args.text)
    print(json.dumps(out))
    return 0


def _lm_counts(lm):
    """NgramCounts behind any registry scorer (StupidBackoff holds
    ``_c``, the KN family holds ``stats.counts``)."""
    if hasattr(lm, "_c"):
        return lm._c
    if hasattr(lm, "stats"):
        return lm.stats.counts
    return None


def _vocab_words(counts) -> list[str]:
    if hasattr(counts, "vocab"):  # FrozenCounts
        return sorted(counts.vocab)
    return sorted(w for (w,) in counts.counts[1])


def _iter_ngrams(counts, k: int):
    if hasattr(counts, "iter_ngrams"):  # FrozenCounts
        yield from sorted(counts.iter_ngrams(k))
        return
    for g in sorted(counts.counts[k]):
        yield g, counts.counts[k][g]


def predict_next_word(lm, history: list[str]) -> str:
    """``CountingStringLM.predictNextWord`` (:296-321): prune the
    history to the last order-1 words, argmax log10 p(history + w) over
    the vocabulary (first-seen word wins ties, like the Java strict->
    comparison over the vocabulary iterator; ours iterates the unigram
    table in sorted order for determinism)."""
    counts = _lm_counts(lm)
    if counts is None:
        raise ValueError("scorer does not expose a vocabulary")
    pruned = history[max(0, len(history) - (lm.order - 1)):]
    best_w, best_p = "<unk>", -float("inf")
    for w in _vocab_words(counts):
        lp = lm.ngram_log10_prob(pruned + [w])
        if lp > best_p:
            best_p, best_w = lp, w
    return best_w


def cmd_lm_repl(args) -> int:
    """StartLM inspection loop (``StartLM.java:206-249``): the
    ``:i :pn :ps :pw :l :q`` commands over the in-process LM (the RMI
    server surface is a declared non-goal; ``:s :r :v`` manage the
    remote process and have no analog)."""
    import math

    from .lm.perplexity import document_perplexity, text_ngrams
    from .lm.train import build_scorer_lm

    lm = build_scorer_lm(args.sf_dir, args.order, args.scorer)
    counts = _lm_counts(lm)
    out = sys.stdout
    prompt = (
        "+++\nWhat do you want to do?\n"
        " :i  LM infos   :pn ngram probs   :ps sequence probs\n"
        " :pw predict words   :l list ngrams   :q quit\n$> "
    )
    LOG10_2 = math.log10(2.0)

    def read_line(p):
        out.write(p)
        out.flush()
        line = sys.stdin.readline()
        return None if line == "" else line.rstrip("\n")

    while True:
        line = read_line(prompt)
        if line is None or line.strip() in (":q", "q"):
            return 0
        action = line.strip().lower()
        if action in (":i", "i"):
            out.write("####\nLanguage Model Information:\n")
            out.write("%-30s %s\n" % ("Scorer:", args.scorer))
            out.write("%-30s %d\n" % ("Order:", lm.order))
            if counts is not None:
                for n in range(1, lm.order + 1):
                    out.write(
                        "%-30s %d distinct / %d total\n"
                        % ("%d-grams:" % n, counts.num_distinct(n),
                           counts.total(n))
                    )
        elif action in (":pn", "pn"):
            while (s := read_line("ngram (:q to stop) $> ")) not in (None, ":q"):
                ngram = s.strip().split(" ")
                if len(ngram) > lm.order:
                    out.write("%s is too long (max %d).\n" % (ngram, lm.order))
                    continue
                lp = lm.ngram_log10_prob(ngram)
                out.write(
                    "%s\n =  %g (log10=%g, log2=%g)\n"
                    % (ngram, 10.0**lp, lp, lp / LOG10_2)
                )
        elif action in (":ps", "ps"):
            while (s := read_line("sequence (:q to stop) $> ")) not in (None, ":q"):
                ngrams = text_ngrams(s.strip(), lm.order)
                lp = sum(lm.ngram_log10_prob(g) for g in ngrams)
                out.write(
                    "+++\nprob=%g (log10=%g, log2=%g)\n"
                    % (10.0**lp, lp, lp / LOG10_2)
                )
                out.write("perp=%g\n" % document_perplexity(lm, s.strip()))
                out.write("+++ #ngrams= %d +++\n" % len(ngrams))
                for g in ngrams:
                    glp = lm.ngram_log10_prob(g)
                    out.write(
                        "%s\n =  %g (log10=%g, log2=%g)\n"
                        % (g, 10.0**glp, glp, glp / LOG10_2)
                    )
        elif action in (":pw", "pw"):
            sequence = ["<s>"]
            out.write("Initial sequence: '%s'.\n" % " ".join(sequence))
            while (s := read_line(
                "seed sequence, <Enter> continues, :q stops $> "
            )) not in (None, ":q"):
                if s.strip():
                    sequence = s.strip().split(" ")
                word = predict_next_word(lm, sequence)
                sequence.append(word)
                ngram = sequence[max(0, len(sequence) - lm.order):]
                lp = lm.ngram_log10_prob(ngram)
                out.write(
                    " predicted word: %s (p(%s)=%6.3e)\n new sequence: %s\n"
                    % (word, ngram, 10.0**lp, " ".join(sequence))
                )
        elif action in (":l", "l"):
            if counts is None:
                out.write("scorer does not expose its ngram table\n")
                continue
            shown = 0
            for n in range(1, lm.order + 1):
                for g, c in _iter_ngrams(counts, n):
                    out.write("%s\t%d\n" % (" ".join(g), c))
                    shown += 1
                    if shown >= args.list_limit:
                        out.write("... (truncated at %d)\n" % args.list_limit)
                        break
                if shown >= args.list_limit:
                    break
        else:
            out.write("Unknown action '%s'.\n" % action)


def cmd_registry(args) -> int:
    """Incremental-dedup registry operations (the cross-run
    curation-state analog of the crawl's persistent URL-seen):
    register a table's content hashes as a generation, filter a table
    against the registry, or compact generations."""
    _init_ray(args.num_cpus)
    import ray
    import ray.data

    from .state.dedupstore import (
        compact_registry,
        filter_unseen,
        read_manifest,
        register_hashes,
    )

    if args.action == "register":
        # prune at the read: registration hashes one column
        ds = _rp_clean(args.input, columns=[args.column])
        man = register_hashes(
            ds, args.column, args.registry, generation=args.generation,
            num_shards=args.num_shards,
        )
        print(json.dumps(man))
    elif args.action == "filter":
        ds = _rp_clean(args.input)
        out = filter_unseen(ds, args.column, args.registry)
        if args.out:
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        else:
            print(json.dumps({"rows": out.count()}))
    elif args.action == "compact":
        print(json.dumps(compact_registry(args.registry)))
    elif args.action == "stats":
        print(json.dumps(read_manifest(args.registry)))
    else:
        raise SystemExit("unknown action %r" % args.action)
    ray.shutdown()
    return 0


def cmd_chunk(args) -> int:
    """Context-length chunking at sentence boundaries (training prep)."""
    _init_ray(args.num_cpus)
    import ray
    import ray.data

    from .stages.chunking import chunk_documents

    # prune at the read: chunks derive from (id, text) alone
    ds = _rp_clean(args.input, columns=[args.id_column, args.column])
    out = chunk_documents(
        ds, max_tokens=args.max_tokens, column=args.column,
        id_column=args.id_column,
    )
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        print(json.dumps({"rows": out.count()}))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="topicrawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the wave crawl")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    c.add_argument("--out", default=None)
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--max-waves", type=int, default=100000)
    c.add_argument("--scorer", default="stupid_backoff")
    c.add_argument("--seen-filter", default="cuckoo", choices=["cuckoo", "bloom"])
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("score", help="pages -> extract -> LM-score")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--out", default=None)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_score)

    e = sub.add_parser("export-corpus", help="write sentence/plaintext corpora")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument("--out", required=True)
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_export_corpus)

    g = sub.add_parser("segment", help="sentence-split + tokenize text files")
    g.add_argument("--input", required=True)
    g.add_argument("--out", default=None)
    g.add_argument("--filter-level", type=int, default=5)
    g.add_argument("--normalize-level", type=int, default=2)
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_segment)

    d = sub.add_parser("dedup", help="dedup a parquet table")
    d.add_argument("--input", required=True)
    d.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash", "jaccard", "embedding"])
    d.add_argument("--column", default="text")
    d.add_argument("--id-column", default="doc_id")
    d.add_argument("--threshold", type=float, default=0.7)
    d.add_argument("--max-hamming", type=int, default=3)
    d.add_argument("--lsh-bits", type=int, default=0)
    d.add_argument("--out", default=None)
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    sn = sub.add_parser("snapshot", help="diff two crawl snapshots / revisit tiers")
    sn.add_argument("--old", required=True)
    sn.add_argument("--new", required=True)
    sn.add_argument("--text-column", default="text")
    sn.add_argument("--digest-column", default=None,
                    help="use a precomputed digest column instead of hashing text")
    sn.add_argument("--schedule", action="store_true",
                    help="emit per-host revisit tiers instead of the raw diff")
    sn.add_argument("--out", default=None)
    sn.add_argument("--num-cpus", type=int, default=None)
    sn.set_defaults(fn=cmd_snapshot)

    gr = sub.add_parser("graph", help="host-graph analytics over a pages table")
    gr.add_argument("--input", required=True, help="pages parquet (url + html)")
    gr.add_argument(
        "--metric",
        choices=["pagerank", "harmonic", "degrees", "triangles", "kcore",
                 "reciprocity"],
        default="pagerank",
    )
    gr.add_argument("--iterations", type=int, default=5)
    gr.add_argument("--k", type=int, default=4, help="k for --metric kcore")
    gr.add_argument("--out", default=None)
    gr.add_argument("--num-cpus", type=int, default=None)
    gr.set_defaults(fn=cmd_graph)

    u = sub.add_parser("curate", help="dedup+quality+langid curation chain")
    u.add_argument("--input", required=True)
    u.add_argument("--out", required=True)
    u.add_argument("--column", default="text")
    u.add_argument("--id-column", default="doc_id")
    u.add_argument("--lang", default="en")
    u.add_argument("--min-words", type=int, default=10)
    u.add_argument("--min-quality", type=float, default=0.1)
    u.add_argument("--concurrency", type=int, default=4)
    u.add_argument("--num-cpus", type=int, default=None)
    u.set_defaults(fn=cmd_curate)

    n = sub.add_parser("ngram-index", help="build the J4 ngram index + stats")
    n.add_argument("--input", required=True)
    n.add_argument("--out", required=True)
    n.add_argument("--column", default="text")
    n.add_argument("--order", type=int, default=3)
    n.add_argument("--mincount", type=int, default=1)
    n.add_argument("--num-cpus", type=int, default=None)
    n.set_defaults(fn=cmd_ngram_index)

    r = sub.add_parser("registry", help="incremental-dedup hash registry")
    r.add_argument("action", choices=["register", "filter", "compact", "stats"])
    r.add_argument("--registry", required=True)
    r.add_argument("--input", default=None)
    r.add_argument("--column", default="text")
    r.add_argument("--generation", default="gen0")
    r.add_argument("--num-shards", type=int, default=64)
    r.add_argument("--out", default=None)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_registry)

    k = sub.add_parser("chunk", help="sentence-boundary context chunking")
    k.add_argument("--input", required=True)
    k.add_argument("--max-tokens", type=int, default=512)
    k.add_argument("--column", default="text")
    k.add_argument("--id-column", default="doc_id")
    k.add_argument("--out", default=None)
    k.add_argument("--num-cpus", type=int, default=None)
    k.set_defaults(fn=cmd_chunk)

    m = sub.add_parser("lm", help="ngram probs + perplexity of a text")
    m.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    m.add_argument("--text", required=True)
    m.add_argument("--order", type=int, default=3)
    m.add_argument("--scorer", default="stupid_backoff")
    m.set_defaults(fn=cmd_lm)

    mr = sub.add_parser(
        "lm-repl", help="StartLM inspection loop (:i :pn :ps :pw :l :q)"
    )
    mr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    mr.add_argument("--order", type=int, default=3)
    mr.add_argument("--scorer", default="stupid_backoff")
    mr.add_argument("--list-limit", type=int, default=200)
    mr.set_defaults(fn=cmd_lm_repl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
