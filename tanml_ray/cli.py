"""Job-runner CLI — the `ray job submit` entrypoint (north_rule).

    python -m tanml_ray.cli validate --input pages_dir --out out_dir \
        [--wave-size 16] [--num-cpus N]
    python -m tanml_ray.cli drift-baseline --input pages_dir --artifact b.pkl
    python -m tanml_ray.cli drift --input pages_dir --artifact b.pkl

On a real cluster:  ray job submit -- python -m tanml_ray.cli validate ...
(the driver-side code is identical; ray.init() connects to the
existing cluster via RAY_ADDRESS). Locally it starts a local session.
Only this module owns ray.init/shutdown — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from tanml_ray.sources.ingest import read_parquet_clean


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tanml_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="resumable flagship validation")
    v.add_argument("--input", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--wave-size", type=int, default=16)

    dv = sub.add_parser("delta-revalidate",
                        help="crawl snapshot delta (added/removed/changed/"
                             "unchanged urls) + flagship validation over "
                             "ONLY the added/changed pages")
    dv.add_argument("--base", required=True,
                    help="previous-snapshot pages parquet path/dir")
    dv.add_argument("--current", required=True,
                    help="current-snapshot pages parquet path/dir")
    dv.add_argument("--out", default=None,
                    help="optional dir for violations parquet + summary.json")
    dv.add_argument("--resumable", action="store_true",
                    help="checkpointed run: staged delta pages + wave "
                         "manifest under --out (required); a rerun skips "
                         "finished partitions")
    dv.add_argument("--wave-size", type=int, default=16)

    b = sub.add_parser("drift-baseline", help="build drift baseline artifact")
    b.add_argument("--input", required=True)
    b.add_argument("--artifact", required=True)
    b.add_argument("--value-col", default="text_len")
    b.add_argument("--bucket", default="week")

    d = sub.add_parser("drift", help="drift report vs baseline artifact")
    d.add_argument("--input", required=True)
    d.add_argument("--artifact", required=True)
    d.add_argument("--report-out", default=None)

    fr = sub.add_parser("full-report",
                        help="validation + drift + roll-up + narratives")
    fr.add_argument("--input", required=True)
    fr.add_argument("--out", required=True)
    fr.add_argument("--baseline-artifact", default=None)

    iw = sub.add_parser("ingest-warc", help="land .warc/.warc.gz crawl "
                        "files as pages parquet (url, warc_ts, html[, text])")
    iw.add_argument("--input", required=True,
                    help="a WARC file or a directory of .warc/.warc.gz")
    iw.add_argument("--out", required=True)
    iw.add_argument("--extract-text", action="store_true",
                    help="add the byte-exact extracted text column "
                         "during landing")
    iw.add_argument("--langid", action="store_true",
                    help="also add the n-gram language-ID column "
                         "(implies --extract-text); lands the full "
                         "flagship pages schema url/warc_ts/html/text/lang")

    cu = sub.add_parser("curate", help="LLM training-data curation: "
                        "quality → langid → dedup → tokens")
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--min-tokens", type=int, default=5)
    cu.add_argument("--near-dup-threshold", type=float, default=0.8)
    cu.add_argument("--c4-clean", action="store_true",
                    help="apply C4 line-level cleaning before quality")
    cu.add_argument("--langs", default=None,
                    help="comma-separated language allow-list")
    cu.add_argument("--resumable", action="store_true",
                    help="checkpoint the per-file quality stage under "
                         "--out (reruns skip finished input shards)")

    co = sub.add_parser("compact", help="rewrite a parquet dir into "
                        "size-balanced files, optionally sorted by a key")
    co.add_argument("--input", required=True)
    co.add_argument("--out", required=True)
    co.add_argument("--sort-key", default=None)
    co.add_argument("--target-rows", type=int, default=1_000_000)

    mi = sub.add_parser("migrate", help="spec-driven schema migration: "
                        "rename/cast/fill/drop columns in one pass")
    mi.add_argument("--input", required=True)
    mi.add_argument("--out", required=True)
    mi.add_argument("--spec", required=True,
                    help="JSON file: {rename:{old:new}, cast:{col:type}, "
                         "fill:{col:default}, drop:[col,...]}")

    mo = sub.add_parser("monitor", help="feed-health report: Shewhart/"
                        "CUSUM/EWMA charts, coverage gaps, runs test, "
                        "Theil-Sen trend over an events parquet")
    mo.add_argument("--input", required=True,
                    help="events parquet file, dir of shards, or a dir "
                         "containing events.parquet")
    mo.add_argument("--chart-out", default=None,
                    help="optional parquet path for the per-day chart")

    pe = sub.add_parser("pretrain-export",
                        help="end-to-end training-data export: curate -> "
                             "seeded shuffle -> token accounting -> "
                             "sharded parquet + manifest")
    pe.add_argument("--input", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--text-col", default="text")
    pe.add_argument("--id-col", default="doc_id")
    pe.add_argument("--n-shards", type=int, default=8)
    pe.add_argument("--seed", type=int, default=42)
    pe.add_argument("--ctx", type=int, default=512)
    pe.add_argument("--min-tokens", type=int, default=5)
    pe.add_argument("--c4-clean", action="store_true")
    pe.add_argument("--langs", default=None,
                    help="comma-separated language allow-list")

    sh = sub.add_parser("shuffle-shards",
                        help="deterministic seeded corpus shuffle into "
                             "training shards (curate.shuffle_shards)")
    sh.add_argument("--input", required=True,
                    help="parquet path/dir with an integer id column")
    sh.add_argument("--out", required=True,
                    help="output dir: hive-partitioned parquet by shard")
    sh.add_argument("--id-col", default="doc_id")
    sh.add_argument("--n-shards", type=int, default=8)
    sh.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    # fail fast with a one-line diagnosis BEFORE starting a Ray session
    # INPUT paths only — drift-baseline's --artifact is an OUTPUT
    input_attrs = {"validate": ["input"], "drift-baseline": ["input"],
                   "delta-revalidate": ["base", "current"],
                   "drift": ["input", "artifact"],
                   "full-report": ["input", "baseline_artifact"],
                   "curate": ["input"], "ingest-warc": ["input"],
                   "shuffle-shards": ["input"], "monitor": ["input"],
                   "pretrain-export": ["input"],
                   "compact": ["input"], "migrate": ["input", "spec"]}
    for attr in input_attrs.get(args.cmd, []):
        path = getattr(args, attr, None)
        if path and not os.path.exists(path):
            flag = "--" + attr.replace("_", "-")
            print(json.dumps({"error": f"{flag} path does not exist: {path}"}),
                  file=sys.stderr)
            return 2

    _ensure_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "validate":
            from tanml_ray.state.checkpoint import run_resumable_validation

            summary = run_resumable_validation(args.input, args.out,
                                               wave_size=args.wave_size)
            print(json.dumps(summary, default=str))
        elif args.cmd == "delta-revalidate":
            if args.resumable:
                if not args.out:
                    raise ValueError("--resumable requires --out")
                from tanml_ray.pipelines.delta import revalidate_delta_resumable

                counts, summary = revalidate_delta_resumable(
                    args.base, args.current, args.out,
                    wave_size=args.wave_size)
            else:
                from tanml_ray.pipelines.delta import revalidate_delta

                counts, report = revalidate_delta(args.base, args.current,
                                                  out_dir=args.out)
                summary = report.summary if report else None
            print(json.dumps({
                "delta": {r["status"]: r["n_urls"]
                          for r in counts.to_pylist()},
                "validation": summary}, default=str))
        elif args.cmd == "drift-baseline":
            import ray.data as rd

            from tanml_ray.pipelines.drift import build_drift_baseline

            ds = read_parquet_clean(args.input)
            baseline = build_drift_baseline(ds, args.value_col, args.bucket)
            baseline.save(args.artifact)
            print(json.dumps({"groups": len(baseline.groups),
                              "artifact": args.artifact}))
        elif args.cmd == "drift":
            import ray.data as rd

            from tanml_ray.pipelines.drift import DriftBaseline, compute_drift

            baseline = DriftBaseline.load(args.artifact)
            table, summary = compute_drift(baseline, read_parquet_clean(args.input))
            if args.report_out:
                import pyarrow.parquet as pq

                pq.write_table(table, args.report_out)
            print(json.dumps(summary, default=str))
        elif args.cmd == "full-report":
            from tanml_ray.pipelines.report import run_full_report

            out = run_full_report(args.input, args.out,
                                  baseline_artifact=args.baseline_artifact)
            print(json.dumps({"status": out["rollup"]["status"],
                              "report": os.path.join(args.out, "report.json"),
                              "narratives": out["narratives"]}, default=str))
        elif args.cmd == "ingest-warc":
            from tanml_ray.sources.warc import read_warc

            if os.path.isdir(args.input):
                paths = sorted(
                    os.path.join(args.input, f)
                    for f in os.listdir(args.input)
                    if f.endswith((".warc", ".warc.gz")))
            else:
                paths = [args.input]
            if not paths:
                raise ValueError(f"no .warc/.warc.gz files in {args.input}")
            ds = read_warc(paths)
            if args.extract_text or args.langid:
                import pyarrow as pa

                from tanml_ray.functions.html_text import extract_text_array
                want_lang = args.langid

                def with_text(batch: pa.Table) -> pa.Table:
                    text = extract_text_array(batch.column("html"))
                    batch = batch.append_column("text", text)
                    if want_lang:
                        from tanml_ray.stages.text import langid_of

                        langs = [langid_of(t or "")[0]
                                 for t in text.to_pylist()]
                        batch = batch.append_column(
                            "lang", pa.array(langs, type=pa.string()))
                    return batch

                ds = ds.map_batches(with_text, batch_format="pyarrow")
            ds.write_parquet(args.out)
            import pyarrow.dataset as pads

            n = sum(f.count_rows() for f in
                    pads.dataset(args.out).get_fragments())
            print(json.dumps({"files_in": len(paths), "rows": n,
                              "out": args.out}))
        elif args.cmd == "compact":
            from tanml_ray.pipelines.compact import compact_parquet

            if os.path.exists(os.path.join(args.out, "_DONE")):
                print(json.dumps({"skipped": "already compacted",
                                  "out": args.out}))
            else:
                print(json.dumps(compact_parquet(
                    args.input, args.out, sort_key=args.sort_key,
                    target_rows_per_file=args.target_rows)))
        elif args.cmd == "migrate":
            from tanml_ray.pipelines.migrate import migrate_schema

            with open(args.spec) as fh:
                spec = json.load(fh)
            print(json.dumps(migrate_schema(args.input, args.out, spec)))
        elif args.cmd == "monitor":
            from tanml_ray.pipelines.monitor import run_feed_monitor

            summary, chart = run_feed_monitor(args.input)
            if args.chart_out:
                import pyarrow.parquet as pq

                pq.write_table(chart, args.chart_out)
                summary["chart_out"] = args.chart_out
            print(json.dumps(summary, default=str))
        elif args.cmd == "pretrain-export":
            from tanml_ray.pipelines.pretrain import pretrain_export

            langs = (set(args.langs.split(",")) if args.langs else None)
            manifest = pretrain_export(
                read_parquet_clean(args.input), args.out,
                text_col=args.text_col, id_col=args.id_col,
                n_shards=args.n_shards, seed=args.seed, ctx=args.ctx,
                min_tokens=args.min_tokens, c4_clean=args.c4_clean,
                allowed_langs=langs)
            print(json.dumps({"rows_exported": manifest["rows_exported"],
                              "n_shards": args.n_shards,
                              "manifest": os.path.join(args.out,
                                                       "manifest.json")}))
        elif args.cmd == "shuffle-shards":
            import ray.data as rd

            from tanml_ray.pipelines.curate import shuffle_shards

            ds = read_parquet_clean(args.input)
            out = shuffle_shards(ds, id_col=args.id_col,
                                 n_shards=args.n_shards, seed=args.seed)
            out.write_parquet(args.out, partition_cols=["shard"])
            print(json.dumps({"rows": out.count(),
                              "n_shards": args.n_shards,
                              "seed": args.seed, "out": args.out}))
        elif args.cmd == "curate":
            import ray.data as rd

            from tanml_ray.pipelines.curate import curate_documents

            langs = (set(args.langs.split(",")) if args.langs else None)
            if args.resumable:
                from tanml_ray.pipelines.curate import run_resumable_curation

                if args.c4_clean:
                    raise ValueError(
                        "--c4-clean is not supported with --resumable "
                        "yet; run it as a landing pass first")
                stats = run_resumable_curation(
                    args.input, args.out, text_col=args.text_col,
                    id_col=args.id_col, min_tokens=args.min_tokens,
                    allowed_langs=langs,
                    near_dup_threshold=args.near_dup_threshold)
            else:
                ds = read_parquet_clean(args.input)
                _, stats = curate_documents(
                    ds, text_col=args.text_col, id_col=args.id_col,
                    min_tokens=args.min_tokens, allowed_langs=langs,
                    c4_clean=args.c4_clean,
                    near_dup_threshold=args.near_dup_threshold,
                    out_dir=args.out)
            print(json.dumps(stats, default=str))
    except Exception as e:  # surface a one-line JSON error, not a traceback
        import traceback

        print(json.dumps({"error": f"{type(e).__name__}: {e}",
                          "hint": "run with TANML_RAY_DEBUG=1 for the "
                                  "full traceback"}), file=sys.stderr)
        if os.environ.get("TANML_RAY_DEBUG"):
            traceback.print_exc()
        return 1
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
