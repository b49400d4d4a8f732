"""CLI entry point — the `ray job submit` surface (BASELINE.json:14
"run via ray job submit ... resumable from checkpoint").

    python -m wsid_ray.run --scale sf0.01 --out /tmp/kg_out [--shard-files 2]

Runs (or RESUMES — completed partitions in the manifest are skipped) the
checkpointed flagship pipeline and prints per-partition stats.  Owns its
Ray session only when none exists (`ray job submit` provides one).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", default="sf0.001",
                   help="fixture scale or driver sf_dir")
    p.add_argument("--out", required=True, help="checkpoint/output dir")
    p.add_argument("--shard-files", type=int, default=1)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only used when this process must ray.init itself")
    args = p.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from wsid_ray.runtime import configure
    configure()

    from wsid_ray.pipelines.checkpointed import run_checkpointed, triples_dataset
    ckpt = run_checkpointed(args.scale, args.out,
                            shard_files=args.shard_files)
    n = triples_dataset(args.out).count()
    print(json.dumps({"out": args.out, "n_triples": n,
                      "partitions": ckpt.stats()}))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
