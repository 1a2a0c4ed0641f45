"""Runnable twin of the reference's llama-index comparison (C21).

The reference ships `experiments/llama-index-synthetic-data/` — train a
llama-index ``LinearAdapterEmbeddingModel`` (a linear layer over a
FROZEN base embedder, trained on (query, positive) pairs with an
in-batch MultipleNegativesRankingLoss at scale 20 over cosine sims,
`train_dataset_llama.py:1-24`) and score hit_rate / MRR @10
(`eval_utils.py:10-55`), against DALM's contrastive and end-to-end
arms.  Its finding: the linear adapter moves the base model by ~nothing
(0.4945 → 0.4915 hit rate) while rag-e2e reaches 0.736
(`experiments/llama-index-synthetic-data/README.md`).

This offline twin runs the same protocol on the synthetic
synonym-cipher corpus used by `quality_directional.py` (pretrained bge
weights and the 200k corpus are unavailable offline):

  base     — the shared random-init encoder, frozen (the "bge" row).
  adapter  — SAME frozen encoder + a trained linear adapter on the
             QUERY side only, identity-init, in-batch CE over
             20 * cosine(W q + b, p): the llama-index analog.
  (optional --with-dalm-arms) retriever-only contrastive and rag-e2e
             joint training from `dalm_tpu.train`, same corpus/seed.

Metrics are the reference experiment's: hit_rate@10 and MRR@10 through
the exact sharded index.  One command:

    python experiments/llama_index_twin.py --cpu-mesh --seeds 3
    python experiments/llama_index_twin.py --with-dalm-arms   # TPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_directional import (  # noqa: E402
    make_corpus,
    make_corpus_mixed,
    make_vocab,
    paired_stats,
    title_split,
)


def embed_rows(embed_fn, ids, mask, batch, dim):
    out = np.zeros((len(ids), dim), np.float32)
    for start in range(0, len(ids), batch):
        end = min(start + batch, len(ids))
        bi, bm = ids[start:end], mask[start:end]
        if end - start < batch:
            pad = batch - (end - start)
            bi = np.concatenate([bi, np.repeat(bi[-1:], pad, axis=0)])
            bm = np.concatenate([bm, np.repeat(bm[-1:], pad, axis=0)])
        out[start:end] = np.asarray(embed_fn(bi, bm), np.float32)[: end - start]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passages", type=int, default=2048)
    ap.add_argument("--pair-vocab", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=8, help="adapter epochs")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--query-len", type=int, default=48)
    ap.add_argument("--passage-len", type=int, default=96)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--out", default="experiments/results_llama_index_twin")
    ap.add_argument("--cpu-mesh", action="store_true")
    ap.add_argument("--with-dalm-arms", action="store_true",
                    help="also train retriever-only + rag-e2e rows (slower)")
    ap.add_argument("--dalm-epochs", type=int, default=16)
    ap.add_argument("--dalm-lr", type=float, default=3e-4)
    ap.add_argument("--gen-len", type=int, default=224)
    ap.add_argument("--base-dir", default=None,
                    help="frozen base = this saved encoder checkpoint (e.g. "
                    "experiments/proxy_base/encoder) instead of a random init "
                    "— the pretrained-proxy protocol (round-4 VERDICT #1)")
    ap.add_argument("--vocab-json", default=None,
                    help="proxy meta.json: use the mixed known+new-vocab "
                    "downstream corpus instead of the self-contained synonym one")
    ap.add_argument("--new-vocab", type=int, default=128)
    ap.add_argument("--known-per-doc", type=int, default=3)
    ap.add_argument("--in-domain", action="store_true",
                    help="downstream corpus = FRESH passages from the PRETRAINING "
                    "vocabulary (zero domain shift; needs --vocab-json). The "
                    "linear-residual theory predicts adapter ≈ base here — the "
                    "reference's regime — vs the mixed corpus where the shifted "
                    "domain leaves a large linearly-recoverable residual")
    ap.add_argument("--corpus-seed", type=int, default=55,
                    help="rng seed for --in-domain passage composition (55 is "
                    "disjoint from the pretraining corpus's seed 0)")
    ap.add_argument("--generator", default="tiny",
                    help="generator spec for the rag-e2e arm (preset or saved dir, "
                    "e.g. experiments/proxy_base/generator)")
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
    import optax
    from datasets import Dataset

    from dalm_tpu.core.mesh import MeshConfig, make_mesh, unbox
    from dalm_tpu.data.tokenizer import resolve_tokenizer
    from dalm_tpu.eval.common import preprocess_eval_dataset
    from dalm_tpu.eval.retriever import build_embed_fn, evaluate_retriever
    from dalm_tpu.index.dense import ShardedDenseIndex
    from dalm_tpu.models.embedder import SentenceEmbedder
    from dalm_tpu.models.encoder import Encoder
    from dalm_tpu.models.registry import ENCODER_PRESETS, load_pretrained, save_pretrained

    os.makedirs(args.out, exist_ok=True)
    if args.vocab_json:
        with open(args.vocab_json) as f:
            meta = json.load(f)
        vocab_known = (meta["keywords"], meta["synonyms"])
        if args.in_domain:
            rows = make_corpus(args.passages, seed=args.corpus_seed, vocab=vocab_known)
        else:
            if meta.get("vocab_style", "word") == "syll":
                from quality_directional import make_vocab_syll

                vocab_new = make_vocab_syll(101, args.new_vocab, cons="npqrstvwz")
            else:
                vocab_new = make_vocab(101, args.new_vocab, tuple(meta["kw_len"]))
            rows = make_corpus_mixed(
                args.passages, vocab_known, vocab_new, known_per_doc=args.known_per_doc
            )
    else:
        rows = make_corpus(args.passages, vocab_size=args.pair_vocab)
    train_rows, test_rows = title_split(rows)
    train_ds = Dataset.from_list(train_rows)
    test_ds = Dataset.from_list(test_rows)
    print(f"corpus: {len(train_rows)} train / {len(test_rows)} test rows")

    if args.base_dir:
        # Pretrained-proxy protocol: the frozen base is a certified
        # checkpoint (pretrain_proxy.py), playing the reference's
        # pretrained bge-large role.
        base_dir = args.base_dir
        cfg, params = load_pretrained(base_dir)
        print(f"frozen base: pretrained checkpoint {base_dir}")
    else:
        # Shared random-init base encoder (round-3 protocol).
        vocab = 384
        cfg = dataclasses.replace(ENCODER_PRESETS["tiny"](), vocab_size=vocab)
        enc = Encoder(cfg)
        ids0 = jnp.zeros((1, args.query_len), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
        base_dir = os.path.join(args.out, "base_encoder")
        save_pretrained(base_dir, cfg, jax.device_get(unbox(params)), extra={"tokenizer": "byte"})

    mesh = make_mesh(MeshConfig())
    model = SentenceEmbedder(cfg)
    tok = resolve_tokenizer("byte")
    embed_fn = build_embed_fn(model, params)
    dim = model.embedding_dim

    def featurize(ds, max_q, max_p):
        proc = preprocess_eval_dataset(ds, tok, "Question", "Abstract", max_p)
        return (
            np.asarray(proc["retriever_query_input_ids"], np.int32),
            np.asarray(proc["retriever_query_attention_mask"], np.int32),
            np.asarray(proc["retriever_passage_input_ids"], np.int32),
            np.asarray(proc["retriever_passage_attention_mask"], np.int32),
            list(proc["Abstract"]),
        )

    tr_qi, tr_qm, tr_pi, tr_pm, _ = featurize(train_ds, args.query_len, args.passage_len)
    te_qi, te_qm, te_pi, te_pm, te_gold = featurize(test_ds, args.query_len, args.passage_len)

    print("embedding with the frozen base encoder ...")
    q_tr = embed_rows(embed_fn, tr_qi, tr_qm, 64, dim)
    p_tr = embed_rows(embed_fn, tr_pi, tr_pm, 64, dim)
    q_te = embed_rows(embed_fn, te_qi, te_qm, 64, dim)
    # unique test passages as the retrieval pool (reference embeds the
    # whole corpus; here the held-out pool, matching quality_directional)
    uniq, first = {}, []
    for i, g in enumerate(te_gold):
        if g not in uniq:
            uniq[g] = len(uniq)
            first.append(i)
    p_te = embed_rows(embed_fn, te_pi[first], te_pm[first], 64, dim)
    gold_idx = np.asarray([uniq[g] for g in te_gold])

    # ---- llama-index-analog adapter training -----------------------------
    # MultipleNegativesRankingLoss: CE over scale * cosine(W q + b, p_j)
    # with in-batch negatives, scale 20 (llama-index adapter_utils default).
    scale = 20.0

    def adapter_apply(w, b, q):
        return q @ w + b

    @jax.jit
    def train_step(opt_state, w, b, qb, pb):
        def loss_fn(wb):
            w_, b_ = wb
            aq = adapter_apply(w_, b_, qb)
            aq = aq / (jnp.linalg.norm(aq, axis=-1, keepdims=True) + 1e-9)
            pn = pb / (jnp.linalg.norm(pb, axis=-1, keepdims=True) + 1e-9)
            logits = scale * (aq @ pn.T)
            labels = jnp.arange(qb.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)((w, b))
        updates, opt_state = optimizer.update(grads, opt_state, (w, b))
        (w, b) = optax.apply_updates((w, b), updates)
        return opt_state, w, b, loss

    def eval_adapter(w, b):
        aq = np.asarray(adapter_apply(w, b, jnp.asarray(q_te)))
        index = ShardedDenseIndex.build(mesh, p_te)
        _, found = index.search(aq.astype(np.float32), args.top_k)
        hits = found == gold_idx[:, None]
        hit_rate = float(hits.any(axis=1).mean())
        ranks = np.where(hits.any(axis=1), hits.argmax(axis=1) + 1, 0)
        mrr = float(np.where(ranks > 0, 1.0 / np.maximum(ranks, 1), 0.0).mean())
        return hit_rate, mrr

    results = {}
    base_hit, base_mrr = eval_adapter(jnp.eye(dim), jnp.zeros((dim,)))
    results["base"] = {"hit_rate": base_hit, "mrr": base_mrr}
    print(f"[base]    hit_rate@{args.top_k}={base_hit:.4f} mrr={base_mrr:.4f}")

    ft_hits, ft_mrrs = [], []
    for seed in range(42, 42 + args.seeds):
        rng = np.random.default_rng(seed)
        w, b = jnp.eye(dim), jnp.zeros((dim,))
        optimizer = optax.adam(args.lr)
        opt_state = optimizer.init((w, b))
        n = len(q_tr)
        for _ in range(args.epochs):
            order = rng.permutation(n)
            for s in range(0, n - args.batch + 1, args.batch):
                sel = order[s : s + args.batch]
                opt_state, w, b, loss = train_step(
                    opt_state, w, b, jnp.asarray(q_tr[sel]), jnp.asarray(p_tr[sel])
                )
        hit, mrr = eval_adapter(w, b)
        ft_hits.append(hit)
        ft_mrrs.append(mrr)
        print(f"[adapter s{seed}] hit_rate@{args.top_k}={hit:.4f} mrr={mrr:.4f}")
    results["adapter"] = {
        "hit_rate_mean": float(np.mean(ft_hits)), "mrr_mean": float(np.mean(ft_mrrs)),
        "per_seed_hit": ft_hits, "per_seed_mrr": ft_mrrs,
    }
    results["adapter_vs_base"] = paired_stats(ft_hits, [base_hit] * len(ft_hits))

    # ---- optional DALM arms on the same corpus ---------------------------
    if args.with_dalm_arms:
        from dalm_tpu.train.rag_e2e import train_e2e
        from dalm_tpu.train.retriever_only import train_retriever

        common = dict(
            per_device_train_batch_size=16, num_train_epochs=args.dalm_epochs,
            learning_rate=args.dalm_lr, query_max_len=args.query_len,
            passage_max_len=args.passage_len, with_tracking=False,
            use_dropout=False, num_warmup_steps=0,
        )
        eval_common = dict(
            max_length=args.passage_len, top_k=args.top_k,
            test_batch_size=32, query_batch_size=32,
        )
        ro_hits, e2e_hits = [], []
        for seed in range(42, 42 + args.seeds):
            ro_out = os.path.join(args.out, f"ro_s{seed}")
            train_retriever(base_dir, train_ds, seed=seed, output_dir=ro_out, **common)
            ev = evaluate_retriever(test_ds, os.path.join(ro_out, "retriever"), **eval_common)
            ro_hits.append(ev.hit_rate)
            print(f"[retriever-only s{seed}] hit_rate={ev.hit_rate:.4f} mrr={ev.mrr:.4f}")
            e2e_out = os.path.join(args.out, f"e2e_s{seed}")
            train_e2e(
                train_ds, base_dir, args.generator, seed=seed, output_dir=e2e_out,
                generator_max_len=args.gen_len, **common,
            )
            ev = evaluate_retriever(test_ds, os.path.join(e2e_out, "retriever"), **eval_common)
            e2e_hits.append(ev.hit_rate)
            print(f"[rag-e2e s{seed}] hit_rate={ev.hit_rate:.4f} mrr={ev.mrr:.4f}")
        results["retriever-only"] = {
            "hit_rate_mean": float(np.mean(ro_hits)), "per_seed_hit": ro_hits,
        }
        results["rag-e2e"] = {
            "hit_rate_mean": float(np.mean(e2e_hits)), "per_seed_hit": e2e_hits,
        }
        results["e2e_vs_adapter"] = paired_stats(e2e_hits, ft_hits)

    # ---- table (the reference README's shape) ----------------------------
    print(f"\n{'retriever':<24} {'hit_rate@10':>12} {'mrr':>8}")
    print(f"{'base (frozen)':<24} {results['base']['hit_rate']:>12.4f} {results['base']['mrr']:>8.4f}")
    print(
        f"{'linear adapter (twin)':<24} {results['adapter']['hit_rate_mean']:>12.4f}"
        f" {results['adapter']['mrr_mean']:>8.4f}"
    )
    for k in ("retriever-only", "rag-e2e"):
        if k in results:
            print(f"{k:<24} {results[k]['hit_rate_mean']:>12.4f} {'—':>8}")

    with open(os.path.join(args.out, "llama_index_twin.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {args.out}/llama_index_twin.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
