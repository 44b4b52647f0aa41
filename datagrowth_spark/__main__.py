"""Management CLI (R13 parity).

The reference ships management commands — ``dump_dataset`` /
``load_dataset`` / ``dump_resource`` / ``load_resource`` (JSON-lines on
disk) and ``grow_dataset`` with querystring-style config
(``datagrowth/management/commands/*.py``, base
``datagrowth/management/base.py:13-63``,
``grow_dataset.py:36-70``). Spark-native equivalents:

    python -m datagrowth_spark dump-collection  <collection_path> <out_path> [--fmt jsonl|parquet]
    python -m datagrowth_spark load-collection  <in_path> <collection_path> [--fmt jsonl|parquet]
    python -m datagrowth_spark grow-dataset     <module:Class> --warehouse <root> [-c key=value ...]
    python -m datagrowth_spark list-versions    <module:Class> --warehouse <root>
    python -m datagrowth_spark curate           <sf_dir> <out_path>

``grow-dataset`` imports the Dataset class, parses ``-c key=value``
config pairs (the reference's DecodeConfigAction shape), and runs one
growth cycle; if the class defines ``seed_collection(collection)`` it
is used as the seeding callable.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys


def _get_spark():
    from datagrowth_spark.core.session import get_spark

    return get_spark(app_name="datagrowth-spark-cli")


def _import_dataset(spec: str):
    module_name, _, cls_name = spec.partition(":")
    if not cls_name:
        raise SystemExit(f"dataset spec must be module:Class — got {spec!r}")
    sys.path.insert(0, os.getcwd())
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def _parse_config(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        try:
            out[key] = json.loads(value)
        except json.JSONDecodeError:
            out[key] = value
    return out


def cmd_dump_collection(args) -> None:
    spark = _get_spark()
    df = spark.read.parquet(args.src)
    if args.fmt == "jsonl":
        df.write.mode("overwrite").json(args.dest)
    else:
        df.write.mode("overwrite").parquet(args.dest)
    print(f"dumped {df.count()} documents to {args.dest} ({args.fmt})")


def cmd_load_collection(args) -> None:
    from datagrowth_spark.datatypes.document import DOCUMENT_SCHEMA

    spark = _get_spark()
    if args.fmt == "jsonl":
        df = spark.read.schema(DOCUMENT_SCHEMA).json(args.src)
    else:
        df = spark.read.parquet(args.src)
    df.write.mode("overwrite").parquet(args.dest)
    print(f"loaded {df.count()} documents into {args.dest}")


def cmd_grow_dataset(args) -> None:
    from datagrowth_spark.plans.dataset import DatasetWarehouse

    spark = _get_spark()
    cls = _import_dataset(args.dataset)
    dataset = cls(_parse_config(args.config))
    warehouse = DatasetWarehouse(spark, args.warehouse)
    seeder = getattr(dataset, "seed_collection", None)
    entry = warehouse.grow(dataset, seeder)
    print(json.dumps({"signature": dataset.signature, **entry}))


def cmd_curate(args) -> None:
    """Run the curation verdict plan over a documents parquet table and
    write per-document verdicts (see queries.q_curation_pipeline)."""
    from datagrowth_spark import queries as Q

    spark = _get_spark()
    out = Q.q_curation_pipeline(spark, os.path.dirname(args.src.rstrip("/"))
                                if args.src.endswith("documents.parquet")
                                else args.src)
    out.write.mode("overwrite").parquet(args.dest)
    kept = out.where(out.verdict == "keep").count()
    print(json.dumps({"documents": out.count(), "kept": kept, "dest": args.dest}))


def cmd_list_versions(args) -> None:
    from datagrowth_spark.plans.dataset import DatasetWarehouse

    spark = _get_spark()
    cls = _import_dataset(args.dataset)
    dataset = cls(_parse_config(args.config))
    meta = DatasetWarehouse(spark, args.warehouse).read_meta(dataset)
    print(json.dumps(meta))


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="datagrowth_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("dump-collection")
    p.add_argument("src"); p.add_argument("dest")
    p.add_argument("--fmt", choices=("jsonl", "parquet"), default="jsonl")
    p.set_defaults(func=cmd_dump_collection)

    p = sub.add_parser("load-collection")
    p.add_argument("src"); p.add_argument("dest")
    p.add_argument("--fmt", choices=("jsonl", "parquet"), default="jsonl")
    p.set_defaults(func=cmd_load_collection)

    p = sub.add_parser("curate")
    p.add_argument("src", help="sf dir containing documents.parquet (or the file itself)")
    p.add_argument("dest")
    p.set_defaults(func=cmd_curate)

    for name, func in (("grow-dataset", cmd_grow_dataset),
                       ("list-versions", cmd_list_versions)):
        p = sub.add_parser(name)
        p.add_argument("dataset", help="module:Class")
        p.add_argument("--warehouse", required=True)
        p.add_argument("-c", "--config", action="append", default=[],
                       help="key=value (value parsed as JSON when possible)")
        p.set_defaults(func=func)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
