"""Command-line entry point — the engine's analog of the reference's three
runnable scripts (``python naive-suppresion.py`` etc. become
``python -m dbms_data_anonymity_differential_privacy_spark naive --input ... --qi ...``).

Prints the pipeline's one-row metrics as a JSON line and optionally writes
the anonymized release as parquet.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dbms_data_anonymity_differential_privacy_spark")
    p.add_argument("pipeline", choices=["naive", "clustering", "tcloseness"])
    p.add_argument("--input", required=True, help="parquet path (or CSV with --adult-csv)")
    p.add_argument("--adult-csv", action="store_true", help="input is reference-shaped CSV ('?' nulls)")
    p.add_argument("--qi", required=True, help="comma-separated quasi-identifier columns")
    p.add_argument("--sensitive", help="sensitive column (tcloseness)")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--t", type=float, default=0.2)
    p.add_argument("--n-clusters", type=int, default=10)
    p.add_argument("--mode", choices=["strict", "reference"], default="strict")
    p.add_argument("--bin", action="append", default=[],
                   metavar="COL=NBINS", help="equal-width bin a QI column (repeatable)")
    p.add_argument("--output", help="write the anonymized release here (parquet)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from dbms_data_anonymity_differential_privacy_spark import get_spark, pipelines
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import read_adult_csv
    from dbms_data_anonymity_differential_privacy_spark.sources.writers import write_release

    spark = get_spark(app_name=f"pipeline-{args.pipeline}")
    spark.sparkContext.setLogLevel("ERROR")
    df = read_adult_csv(spark, args.input) if args.adult_csv else spark.read.parquet(args.input)
    qi = [c.strip() for c in args.qi.split(",") if c.strip()]
    bin_spec = {}
    for spec in args.bin:
        col, _, nb = spec.partition("=")
        bin_spec[col] = int(nb)

    if args.pipeline == "naive":
        out = pipelines.naive_suppression_pipeline(df, qi, k=args.k)
    elif args.pipeline == "clustering":
        out = pipelines.clustering_pipeline(df.na.drop("any"), qi, n_clusters=args.n_clusters, k=args.k)
    else:
        if not args.sensitive:
            print("tcloseness requires --sensitive", file=sys.stderr)
            return 2
        out = pipelines.t_closeness_pipeline(
            df, qi, args.sensitive, k=args.k, t=args.t, bin_spec=bin_spec, mode=args.mode
        )

    metrics = out["metrics"].first().asDict()
    print(json.dumps({"pipeline": args.pipeline, **metrics}, default=str))
    if args.output:
        write_release(out["anonymized"], args.output, mode="overwrite")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
