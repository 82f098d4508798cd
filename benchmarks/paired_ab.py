"""Paired model-vs-model comparison from two --per_clip JSONL dumps.

    python benchmarks/paired_ab.py --a pc_modelA.jsonl --b pc_modelB.jsonl \
        [--key MSE] [--n_boot 10000] [--out result.json]

Both JSONLs must come from `cli.evaluate --per_clip` runs over the SAME
shard in the same order (clip i is the same audio in both). Reports the
paired-bootstrap statistics of B - A on the chosen per-clip column
(lower is better, so positive diff = A wins); see
phasegen_tpu.cli.evaluate.paired_model_stats. The single-eval
bootstrap (--stats) answers "does this model beat GL?"; THIS answers
"is model A better than model B?" — the question every fine-tune /
recipe A/B in BASELINE.md actually asks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# run as `python benchmarks/paired_ab.py`: sys.path[0] is benchmarks/,
# so the repo root must be added for the phasegen_tpu import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_pc(path: str) -> dict:
    rows = [json.loads(line) for line in open(path) if line.strip()]
    rows.sort(key=lambda r: r["clip"])
    return {k: [r[k] for r in rows] for k in rows[0] if k != "clip"}


def main(argv=None) -> None:
    from phasegen_tpu.cli.evaluate import paired_model_stats

    p = argparse.ArgumentParser(description="Paired per-clip model A/B.")
    p.add_argument("--a", required=True, help="per-clip JSONL for model A")
    p.add_argument("--b", required=True, help="per-clip JSONL for model B")
    p.add_argument("--key", default="MSE")
    p.add_argument("--n_boot", default=10000, type=int)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    res = paired_model_stats(load_pc(args.a), load_pc(args.b),
                             key=args.key, n_boot=args.n_boot)
    res["a"], res["b"] = args.a, args.b
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
