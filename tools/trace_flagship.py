"""Capture a jax.profiler trace of the flagship train step (bench.py's
exact config) and print the device-time attribution.

Usage::

    [DALM_W8A8_KERNEL=fused] python tools/trace_flagship.py [--out DIR]

Runs `train_e2e` on the bench.py flagship config (bge-large +
llama2-7B shape, b18, fused QLoRA, int8_compute="all") for one short
epoch with the profiler armed over 3 mid-epoch steps, then runs
tools/trace_attribution.py over the capture. Pair a default run with a
DALM_W8A8_KERNEL=fused run to attribute an A/B regression.
"""

from __future__ import annotations

import argparse
import os
import string
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/trace_flagship")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from datasets import Dataset

    from dalm_tpu.train.rag_e2e import train_e2e

    B, Q, P, G = 18, 50, 128, 256
    rows = B * 24
    rng = np.random.default_rng(0)
    letters = np.array(list(string.ascii_lowercase + " "))

    def text(n, i):
        return "".join(rng.choice(letters, size=n)) + f" {i}"

    ds = Dataset.from_dict(
        {
            "Question": [text(48, i) for i in range(rows)],
            "Abstract": [text(126, i) for i in range(rows)],
            "Answer": [text(60, i) for i in range(rows)],
        }
    )
    train_e2e(
        ds, "bge-large", "llama2-7b",
        per_device_train_batch_size=B, num_train_epochs=1,
        query_max_len=Q, passage_max_len=P, generator_max_len=G,
        retriever_tokenizer="byte@30522", generator_tokenizer="byte@32000",
        dtype="bfloat16", use_peft="both", use_bnb="generator",
        lora_runtime="fused", int8_compute="all",
        with_tracking=False, output_dir=None, num_warmup_steps=0,
        profile_dir=args.out, profile_start_step=12,
        profile_num_steps=args.steps,
    )
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "trace_attribution.py"),
         args.out, "--steps", str(args.steps), "--top", "25"],
        check=True,
    )


if __name__ == "__main__":
    main()
