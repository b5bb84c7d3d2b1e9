"""Held-out BC loss evaluation: the loss-curve-parity companion to training.

Computes the mask-weighted negative log-likelihood per frame of a policy
checkpoint over a contractor dataset directory — the number to compare when
claiming BC loss parity across implementations or fine-tuning runs (the
reference never ships an eval; its only signal is the running train loss,
behavioural_cloning.py:126-128).

Usage:
    python tools/eval_loss.py --in-model foundation-model-1x.model \
        --in-weights foundation-model-1x.weights --data-dir data/ \
        [--batch-size 8] [--chunk-len 128] [--max-batches N]

Prints one JSON line: {"nll_per_frame": ..., "frames": ..., "batches": ...}.

Compare runs at the SAME --batch-size (the loader's trajectory partition and
epoch end depend on it); --batch-size 1 scores every trajectory end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-model", required=True)
    ap.add_argument("--in-weights", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--chunk-len", type=int, default=128)
    ap.add_argument("--max-batches", type=int, default=0)
    ap.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    hp = BCHyperparams(batch_size=args.batch_size, chunk_len=args.chunk_len)
    trainer = BCTrainer.from_files(
        args.in_model, args.in_weights, hp=hp, compute_dtype=args.compute_dtype
    )
    report = trainer.evaluate(args.data_dir, max_batches=args.max_batches or None)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
