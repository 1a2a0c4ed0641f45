"""Pretrain a proxy "base" encoder offline (round-4 VERDICT item #1).

The reference's published comparisons all start from PRETRAINED
embedders (bge-large/bge-small, `/root/reference/README.md:140-144`,
`experiments/llama-index-synthetic-data/README.md`), which are
unavailable offline.  The round-3 llama-index twin therefore ran from a
RANDOM base and recorded an honest inversion of the reference's
ordering (adapter > rag-e2e), with the hypothesis that "which arm wins
is a property of the base embedder".  This script makes that hypothesis
testable offline: contrastively pretrain an encoder on a large synthetic
corpus with its own DISJOINT pairing vocabulary, certify its held-out
retrieval quality, and save it as a checkpoint `registry.resolve_encoder`
loads exactly like real weights — the offline stand-in for bge.

Downstream experiments (`llama_index_twin.py --base-dir`,
`quality_directional.py --base-dir --task mixed`) then start from this
checkpoint on a corpus that mixes known pairs (transfer → the base
scores well above chance, the analog of bge's 0.49 base hit rate) with
NEW pairs (domain-adaptation headroom, the analog of the patent domain).

Optionally (`--with-generator`) the same run pretrains the tiny
generator on the answer-copy task via the joint diagonal objective, so
downstream marginalized arms start from a generator that already copies
(the from-scratch analogue of RAG's pretrained-generator assumption).

Usage (TPU ~minutes; --cpu-mesh for the 8-device virtual mesh):

    python experiments/pretrain_proxy.py --passages 8192 --vocab 512 \
        --epochs 16 --lr 1e-3 --out experiments/proxy_base --with-generator
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_directional import (  # noqa: E402
    make_corpus,
    make_vocab,
    make_vocab_syll,
    title_split,
)

PRETRAIN_VOCAB_SEED = 7  # disjoint from every downstream corpus seed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passages", type=int, default=8192)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--kw-len", default="6,7",
                    help="min,max keyword length; the 6,7 default is fixed-width "
                    "so answer-copying is positional (the regime the round-2 "
                    "diagnosis showed the tiny generator learns)")
    ap.add_argument("--vocab-style", default="syll", choices=["syll", "word"],
                    help="syll = syllable-compositional words (learnable by a "
                    "shallow byte encoder, see make_vocab_syll); word = round-1 "
                    "whole-word bijection (recorded unlearnable at this scale)")
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--query-len", type=int, default=48)
    ap.add_argument("--passage-len", type=int, default=96)
    ap.add_argument("--gen-len", type=int, default=160)
    ap.add_argument("--layers", type=int, default=None, help="override encoder depth")
    ap.add_argument("--hidden", type=int, default=None, help="override encoder width")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="experiments/proxy_base")
    ap.add_argument("--with-generator", action="store_true",
                    help="pretrain via the joint (diagonal) objective so the "
                    "generator learns the copy task too; saves encoder AND generator")
    ap.add_argument("--cpu-mesh", action="store_true")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")

    import dataclasses

    import jax.numpy as jnp
    from datasets import Dataset

    from dalm_tpu.core.mesh import unbox
    from dalm_tpu.eval.retriever import evaluate_retriever
    from dalm_tpu.models.encoder import Encoder
    from dalm_tpu.models.registry import ENCODER_PRESETS, save_pretrained
    from dalm_tpu.train.rag_e2e import train_e2e
    from dalm_tpu.train.retriever_only import train_retriever

    os.makedirs(args.out, exist_ok=True)
    kw_len = tuple(int(x) for x in args.kw_len.split(","))
    if args.vocab_style == "syll":
        vocab = make_vocab_syll(PRETRAIN_VOCAB_SEED, args.vocab)
    else:
        vocab = make_vocab(PRETRAIN_VOCAB_SEED, args.vocab, kw_len)
    rows = make_corpus(args.passages, vocab=vocab)
    train_rows, test_rows = title_split(rows)
    train_ds = Dataset.from_list(train_rows)
    test_ds = Dataset.from_list(test_rows)
    print(f"pretrain corpus: {len(train_rows)} train / {len(test_rows)} test rows, "
          f"{args.vocab} pairs, kw_len={kw_len}")

    # Random init (byte tokenizer, vocab rounded to 384 like every
    # experiment in this directory).
    cfg = dataclasses.replace(ENCODER_PRESETS["tiny"](), vocab_size=384)
    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    if args.hidden:
        cfg = dataclasses.replace(
            cfg, hidden_size=args.hidden, intermediate_size=2 * args.hidden
        )
    enc = Encoder(cfg)
    ids0 = jnp.zeros((1, args.query_len), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
    init_dir = os.path.join(args.out, "init")
    save_pretrained(init_dir, cfg, jax.device_get(unbox(params)), extra={"tokenizer": "byte"})

    common_eval = dict(
        max_length=args.passage_len, top_k=10, test_batch_size=32, query_batch_size=32
    )
    t0 = time.time()
    base_ev = evaluate_retriever(test_ds, init_dir, **common_eval)
    print(f"[random init] recall@10={base_ev.recall:.4f}")

    train_dir = os.path.join(args.out, "train")
    common = dict(
        seed=args.seed, per_device_train_batch_size=args.batch,
        num_train_epochs=args.epochs, learning_rate=args.lr,
        query_max_len=args.query_len, passage_max_len=args.passage_len,
        output_dir=train_dir, with_tracking=False, use_dropout=False,
        num_warmup_steps=0,
    )
    if args.with_generator:
        train_e2e(train_ds, init_dir, "tiny", generator_max_len=args.gen_len, **common)
    else:
        train_retriever(init_dir, train_ds, **common)

    ev = evaluate_retriever(test_ds, os.path.join(train_dir, "retriever"), **common_eval)
    print(f"[pretrained] recall@10={ev.recall:.4f} hit={ev.hit_rate:.4f} "
          f"({time.time() - t0:.0f}s)")

    # Promote the artifacts to stable names and record the certification.
    enc_dir = os.path.join(args.out, "encoder")
    if os.path.isdir(enc_dir):
        shutil.rmtree(enc_dir)
    shutil.copytree(os.path.join(train_dir, "retriever"), enc_dir)
    gen_dir = None
    if args.with_generator:
        gen_dir = os.path.join(args.out, "generator")
        if os.path.isdir(gen_dir):
            shutil.rmtree(gen_dir)
        shutil.copytree(os.path.join(train_dir, "generator"), gen_dir)
    shutil.rmtree(train_dir)  # keep only the promoted copies (checkpoints are big)

    meta = {
        "vocab_seed": PRETRAIN_VOCAB_SEED,
        "vocab_size": args.vocab,
        "vocab_style": args.vocab_style,
        "kw_len": list(kw_len),
        "keywords": vocab[0],
        "synonyms": vocab[1],
        "passages": args.passages,
        "config": {k: v for k, v in vars(args).items()},
        "cert": {
            "random_init_recall@10": base_ev.recall,
            "pretrained_recall@10": ev.recall,
            "pretrained_hit_rate@10": ev.hit_rate,
            "n_test": ev.total_examples,
        },
        "wall_clock_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {args.out}/encoder" + (" + generator" if gen_dir else "")
          + f" (cert recall@10 {ev.recall:.4f}); meta.json has the vocabulary")
    return 0


if __name__ == "__main__":
    sys.exit(main())
