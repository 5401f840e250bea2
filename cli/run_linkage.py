#!/usr/bin/env python
"""``ray job submit`` entrypoint for the flagship linkage pipeline.

Cluster usage (north_star):
    ray job submit --working-dir . -- python cli/run_linkage.py \
        --input s3://bucket/pages/*.parquet --out /mnt/out/linkage \
        --threshold 0.8 --pair-partitions 64

Standalone local usage (auto-inits a local Ray; the graft driver never calls
this — it uses __ray_entry__):
    python cli/run_linkage.py --input /root/testdata/sf0.001/documents.parquet \
        --out /tmp/linkage --key doc_id --text text
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="rayssj record-linkage pipeline")
    ap.add_argument("--input", required=True, help="parquet path/glob of pages")
    ap.add_argument("--out", required=True, help="output root (checkpointed)")
    ap.add_argument("--key", default="url")
    ap.add_argument("--text", default="text")
    ap.add_argument("--html", default="html")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--tokenizer", choices=["whitespace", "qgram2", "qgram3"],
                    default="whitespace")
    ap.add_argument("--extract-partitions", type=int, default=8)
    ap.add_argument("--pair-partitions", type=int, default=4)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; inside a cluster leave unset")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="auto" if args.num_cpus is None else "local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayssj.pipelines import linkage_run
    from rayssj.tokenizers import QgramTokenizer, WhitespaceTokenizer

    tok = {"whitespace": WhitespaceTokenizer(),
           "qgram2": QgramTokenizer(2, return_set=True),
           "qgram3": QgramTokenizer(3, return_set=True)}[args.tokenizer]

    summary = linkage_run(args.input, args.out, key_col=args.key,
                          text_col=args.text, html_col=args.html,
                          threshold=args.threshold, tokenizer=tok,
                          extract_partitions=args.extract_partitions,
                          pair_partitions=args.pair_partitions,
                          num_buckets=args.num_buckets)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
