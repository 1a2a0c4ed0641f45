"""Directional quality reproduction: RAG-e2e > retriever-only > base.

The reference's headline result (`/root/reference/README.md:140-144`) is
recall@10 on a held-out QA split going 0.45984 (plain bge-large) →
0.46037 (retriever-only contrastive) → **0.73634 (RAG-e2e)**: joint
training with the marginalized generator loss improves retrieval far
beyond contrastive-only training. That run needs the 200k patent corpus
and pretrained bge weights (unavailable offline), so this script
reproduces the *directional* effect end-to-end with zero external
assets:

- a synthetic domain corpus: each passage carries a distinctive keyword
  set; each query paraphrases a subset of its passage's keywords with
  filler noise; the answer repeats a keyword (so the generator's
  answer-region loss couples to the retrieval score);
- one shared random-init encoder checkpoint seeds BOTH training runs;
- run A: `train_retriever` (contrastive only);
- run B: `train_e2e` (contrastive + marginalized, identical retriever
  hyperparameters, same seed);
- eval: `evaluate_retriever` recall@10 on the held-out 20% title split,
  same exact-index protocol as the reference's hnswlib eval.

Usage:
    python experiments/quality_directional.py [--passages 512]
        [--model tiny|bge-small] [--epochs 2] [--out experiments/results]

Writes a JSON + markdown row per run; see experiments/README.md for
recorded results.
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _word(rng, kw_len):
    n = rng.integers(kw_len[0], kw_len[1]) if kw_len[1] > kw_len[0] else kw_len[0]
    cons, vow = "bcdfghjklmnpqrstvwz", "aeiou"
    return "".join(
        (cons[rng.integers(len(cons))] if i % 2 == 0 else vow[rng.integers(len(vow))])
        for i in range(n)
    )


def make_vocab(seed: int, size: int, kw_len: tuple = (6, 9)):
    """A (keywords, synonyms) pairing vocabulary with its own rng stream.

    Separate from :func:`make_corpus` so corpora can share a vocabulary
    (in-distribution downstream data for a pretrained-proxy encoder) or
    draw disjoint ones (the pretrain/downstream split the round-3
    VERDICT's pretrained-proxy protocol requires)."""
    rng = np.random.default_rng(seed)
    keywords = [_word(rng, kw_len) for _ in range(size)]
    synonyms = [_word(rng, kw_len) for _ in range(size)]
    return keywords, synonyms


def make_vocab_syll(
    seed: int, size: int, cons: str = "bcdfghjklm", vow: str = "aeiou",
    n_syll: int = 3,
):
    """Syllable-compositional pairing vocabulary (multi-token words a
    SHALLOW encoder can actually learn).

    Round 1's whole-word bijection over random 6-9-char strings is not
    learnable by a 2-layer byte-level encoder (recall plateaued ~0.07;
    deeper encoders collapse from random init — results_bgesmall/).  Here
    each keyword is ``n_syll`` syllables from a consonant x vowel
    inventory and its synonym maps PER SYLLABLE through one arbitrary
    global bijection onto the uppercase inventory: learning reduces to a
    local byte-bigram association (the same subword compositionality
    real models exploit), while words stay genuinely multi-token — the
    property VERDICT r3 weakness #5 asked the decisive testbed to have.
    The bijection is a shuffled permutation, NOT case-mapping, so it
    does not factor to a single-char cipher.

    Disjoint "domains" come from disjoint consonant inventories (e.g.
    pretrain cons="bcdfghjklm", downstream-new cons="npqrstvwz")."""
    rng = np.random.default_rng(seed)
    syl_k = [c + v for c in cons for v in vow]
    syl_s = [s.upper() for s in syl_k]
    perm = rng.permutation(len(syl_k))
    words, seen = [], set()
    while len(words) < size:
        tri = tuple(int(i) for i in rng.integers(0, len(syl_k), size=n_syll))
        if tri in seen:
            continue
        seen.add(tri)
        words.append(tri)
    keywords = ["".join(syl_k[i] for i in tri) for tri in words]
    synonyms = ["".join(syl_s[perm[i]] for i in tri) for tri in words]
    return keywords, synonyms


def make_corpus(
    n_passages: int, seed: int = 0, vocab_size: int = 240, kws_per_doc: int = 6,
    kw_len: tuple = (6, 9), vocab=None,
):
    """Synthetic QA corpus in the toy-CSV schema (Question/Abstract/Answer/Title).

    Queries share NO byte-level tokens with their passages: each passage
    keyword has a fixed "synonym" used on the query side, so a random
    encoder scores near chance and retrieval quality comes entirely from
    learning the synonym pairing during training (the pairing vocabulary
    is global — train docs teach it, test docs recombine it).

    ``vocab``: optional explicit (keywords, synonyms) pair from
    :func:`make_vocab`.  The default (None) draws the vocabulary from the
    same rng stream as before, preserving every recorded corpus."""
    rng = np.random.default_rng(seed)

    def word():
        return _word(rng, kw_len)

    if vocab is None:
        keywords = [word() for _ in range(vocab_size)]
        synonyms = [word() for _ in range(vocab_size)]
    else:
        keywords, synonyms = list(vocab[0]), list(vocab[1])
        vocab_size = len(keywords)
    filler = ["the", "of", "about", "regarding", "system", "method", "device"]
    rows = []
    for i in range(n_passages):
        kw_idx = rng.choice(vocab_size, size=kws_per_doc, replace=False)
        kws = [keywords[j] for j in kw_idx]
        passage = (
            f"{kws[0]} {kws[1]} apparatus comprising {kws[2]} and {kws[3]} "
            f"wherein {kws[4]} connects to {kws[5]} for improved operation."
        )
        q_idx = rng.permutation(kw_idx)[:3]
        syns = [synonyms[j] for j in q_idx]
        query = f"what {filler[int(rng.integers(len(filler)))]} {syns[0]} {syns[1]} {syns[2]}"
        # multi-keyword answer: more answer-region tokens => more
        # marginalized-loss gradient reaching the retriever per sample
        answer = " ".join(keywords[int(j)] for j in q_idx)
        rows.append(
            {"Title": f"doc {i}", "Question": query, "Abstract": passage, "Answer": answer}
        )
    return rows


def make_corpus_mixed(
    n_passages: int, vocab_known, vocab_new, seed: int = 0,
    kws_per_doc: int = 6, known_per_doc: int = 3,
):
    """Downstream "domain" corpus for the pretrained-proxy protocol.

    Each passage draws ``known_per_doc`` keywords from the PRETRAINING
    vocabulary (the pretrained encoder already knows their synonym
    pairing — the transferable structure that lets it score well above
    chance, the analog of bge-large's 0.49 base hit rate on patents,
    reference `README.md:140-142`) and the rest from a NEW vocabulary the
    pretrained encoder has never seen (the domain-adaptation headroom
    that full fine-tuning can exploit, analog of rag-e2e's 0.74).
    Schema/structure otherwise identical to :func:`make_corpus`."""
    rng = np.random.default_rng(seed)
    kw_k, syn_k = vocab_known
    kw_n, syn_n = vocab_new
    keywords = list(kw_k) + list(kw_n)
    synonyms = list(syn_k) + list(syn_n)
    n_known = len(kw_k)
    filler = ["the", "of", "about", "regarding", "system", "method", "device"]
    rows = []
    for i in range(n_passages):
        idx_known = rng.choice(n_known, size=known_per_doc, replace=False)
        idx_new = n_known + rng.choice(
            len(kw_n), size=kws_per_doc - known_per_doc, replace=False
        )
        kw_idx = np.concatenate([idx_known, idx_new])
        rng.shuffle(kw_idx)
        kws = [keywords[j] for j in kw_idx]
        passage = (
            f"{kws[0]} {kws[1]} apparatus comprising {kws[2]} and {kws[3]} "
            f"wherein {kws[4]} connects to {kws[5]} for improved operation."
        )
        q_idx = rng.permutation(kw_idx)[:3]
        syns = [synonyms[j] for j in q_idx]
        query = f"what {filler[int(rng.integers(len(filler)))]} {syns[0]} {syns[1]} {syns[2]}"
        answer = " ".join(keywords[int(j)] for j in q_idx)
        rows.append(
            {"Title": f"doc {i}", "Question": query, "Abstract": passage, "Answer": answer}
        )
    return rows


def make_corpus_chars(
    n_passages: int, seed: int = 0, vocab_size: int = 30, kws_per_doc: int = 6,
    answer_repeats: int = 1,
):
    """Single-byte-token pairing corpus (the decisive-regime testbed).

    Same schema and pairing structure as :func:`make_corpus`, but each
    keyword/synonym is ONE byte token (keywords = lowercase/digits,
    synonyms = uppercase/punctuation, a global bijection): the encoder
    can solve the task at the embedding-table level, so the 2-layer
    tiny model trains to high recall and the learning curve is steep —
    the regime where loss-level differences (e2e's extra doc-logprob
    push, TRUE top-k marginalization under label noise) separate out of
    seed noise instead of drowning in a task the model can't learn
    (round-1 synonym task plateaued at recall ~0.06; VERDICT r1 item 2).

    The Answer is a verbatim copy of the passage's keyword tokens in
    passage order, so the generator's answer likelihood *identifies the
    true passage* among candidates — the mechanism the marginalized
    loss exists to reward (and the property VERDICT r1 asked for:
    "passage identity actually informs answer tokens").
    """
    rng = np.random.default_rng(seed)
    kw_pool = string.ascii_lowercase + string.digits
    syn_pool = string.ascii_uppercase + "!@#$%^&*()[]{}<>?~/+=;:"
    vocab_size = min(vocab_size, len(kw_pool), len(syn_pool))
    keywords = list(kw_pool[:vocab_size])
    synonyms = [syn_pool[int(j)] for j in rng.permutation(vocab_size)]
    rows = []
    for i in range(n_passages):
        kw_idx = rng.choice(vocab_size, size=kws_per_doc, replace=False)
        kws = [keywords[j] for j in kw_idx]
        # Fixed-width shells: every query/passage/answer has IDENTICAL
        # token positions, so the generator's copy task is a positional
        # lookup a 2-layer decoder learns quickly — a sharp
        # p(answer|passage) is the precondition for marginalization to
        # carry retrieval signal (diagnosed round 2: variable filler
        # made copying positional-shift-dependent; the tiny generator's
        # ll gap stayed ~0.02 nats/token and the posterior never moved).
        passage = (
            f"{kws[0]} {kws[1]} apparatus comprising {kws[2]} and {kws[3]} "
            f"wherein {kws[4]} connects to {kws[5]} ."
        )
        q_idx = rng.permutation(kw_idx)[:3]
        syns = [synonyms[j] for j in q_idx]
        query = f"what of {syns[0]} {syns[1]} {syns[2]}"
        # Copy task: all keywords, passage order. ``answer_repeats``
        # lengthens the answer region — the marginalized loss's
        # doc-logprob term carries weight (answer tokens / total
        # unmasked tokens), so longer answers mean more retrieval
        # gradient per step (mirrors the reference's sentence-length
        # patent answers vs these 11-byte ones).
        answer = " ".join(kws * answer_repeats)
        rows.append(
            {"Title": f"doc {i}", "Question": query, "Abstract": passage, "Answer": answer}
        )
    return rows


def mislabel(train_rows, rho: float, seed: int = 0):
    """Swap the Abstracts of a ``rho`` fraction of train rows, pairwise.

    The labeled positive for a swapped row is then a WRONG passage while
    its Answer keywords still come from the TRUE passage (which stays in
    the retrieval pool via its swap partner). Contrastive and
    diagonal-marginalized training follow the corrupted labels; TRUE
    top-k marginalization can recover because the generator's answer
    likelihood identifies the real passage among the candidates — the
    exact mechanism the marginalized loss exists to reward. Returns the
    number of mislabeled rows.
    """
    if rho <= 0:
        return 0
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(train_rows), size=int(len(train_rows) * rho) // 2 * 2, replace=False)
    for a, b in zip(idx[::2], idx[1::2]):
        train_rows[a]["Abstract"], train_rows[b]["Abstract"] = (
            train_rows[b]["Abstract"], train_rows[a]["Abstract"],
        )
    return len(idx)


def paired_stats(a, b, n_boot: int = 10000, seed: int = 0) -> dict:
    """Paired per-seed comparison of arm a vs arm b (same seeds).

    Returns mean delta (a-b), per-seed deltas, win/loss/tie counts, a
    two-sided sign-test p-value, and a 10k-resample bootstrap 95% CI of
    the mean delta. Decisive = CI excludes zero.
    """
    from math import comb

    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    wins, losses = int((d > 0).sum()), int((d < 0).sum())
    n = wins + losses
    p = (
        min(1.0, 2 * sum(comb(n, k) for k in range(min(wins, losses) + 1)) / 2**n)
        if n else 1.0
    )
    rng = np.random.default_rng(seed)
    boots = rng.choice(d, size=(n_boot, len(d)), replace=True).mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    return {
        "mean_delta": float(d.mean()),
        "per_seed_delta": [float(x) for x in d],
        "wins": wins, "losses": losses, "ties": int((d == 0).sum()),
        "sign_test_p": float(p),
        "bootstrap_95ci": [float(lo), float(hi)],
        "decisive": bool(lo > 0 or hi < 0),
    }


def title_split(rows, test_frac=0.2, seed=42):
    """Title-grouped 80/20 split (reference `qa_gen:169-184` semantics)."""
    rng = np.random.default_rng(seed)
    titles = sorted({r["Title"] for r in rows})
    rng.shuffle(titles)
    n_test = int(len(titles) * test_frac)
    test_titles = set(titles[:n_test])
    train = [r for r in rows if r["Title"] not in test_titles]
    test = [r for r in rows if r["Title"] in test_titles]
    return train, test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passages", type=int, default=2048)
    ap.add_argument("--pair-vocab", type=int, default=96)
    ap.add_argument("--model", default="tiny", choices=["tiny", "bge-small"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--query-len", type=int, default=48)
    ap.add_argument("--passage-len", type=int, default=96)
    ap.add_argument("--gen-len", type=int, default=160)
    ap.add_argument("--generator", default="tiny")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--out", default="experiments/results")
    ap.add_argument("--cpu-mesh", action="store_true", help="force 8-device CPU mesh")
    ap.add_argument("--seeds", type=int, default=1, help="training seeds to average over")
    ap.add_argument("--seed-start", type=int, default=42,
                    help="first training seed (contiguous range of --seeds from here)")
    ap.add_argument("--label-noise", type=float, default=0.0,
                    help="fraction of train rows with pairwise-swapped (wrong) positives; "
                    "answers stay tied to the TRUE passage — the regime where the "
                    "marginalized generator likelihood carries retrieval signal the "
                    "contrastive labels don't")
    ap.add_argument("--kw-len", default="6,9",
                    help="min,max keyword length (shorter = easier byte-level task)")
    ap.add_argument("--answer-repeats", type=int, default=1,
                    help="chars task: repeat the keyword answer N times (longer "
                    "answer region = proportionally more doc-logprob gradient)")
    ap.add_argument("--task", default="synonym", choices=["synonym", "chars", "mixed"],
                    help="synonym = round-1 multi-char pairing (weakly learnable "
                    "by the tiny model); chars = single-byte-token pairing with "
                    "copy answers (steep curve, decisive regime); mixed = "
                    "pretrain-vocab + new-vocab downstream corpus for the "
                    "pretrained-proxy protocol (requires --vocab-json)")
    ap.add_argument("--base-dir", default=None,
                    help="start every arm from this saved encoder checkpoint "
                    "(e.g. experiments/proxy_base/encoder) instead of a fresh "
                    "random init — the pretrained-proxy protocol")
    ap.add_argument("--vocab-json", default=None,
                    help="proxy_base meta.json holding the pretraining vocabulary "
                    "(task=mixed draws its known pairs from it)")
    ap.add_argument("--new-vocab", type=int, default=128,
                    help="task=mixed: size of the NEW (never-pretrained) vocabulary")
    ap.add_argument("--known-per-doc", type=int, default=3,
                    help="task=mixed: keywords per doc drawn from the pretrain vocab")
    ap.add_argument("--arms", default="ro,e2e",
                    help="comma list of training arms: ro,e2e (marg arm auto-added "
                    "when --marginalize-k > 0)")
    ap.add_argument("--marginalize-k", type=int, default=0,
                    help="also run a rag-e2e arm with TRUE top-k marginalization")
    ap.add_argument("--marginalize-mode", default="token",
                    choices=["token", "sequence"],
                    help="RAG-token (per-answer-token posterior, ~|y|x stronger "
                    "retrieval gradient) or RAG-sequence marginalization")
    ap.add_argument("--marginalize-scale", type=float, default=None,
                    help="candidate-posterior temperature (None = logit_scale; "
                    "O(10) lets answer likelihood flip the posterior)")
    ap.add_argument("--marginalize-warmup-frac", type=float, default=0.0,
                    help="fraction of total steps trained with the diagonal loss "
                    "before switching to TRUE top-k (generator warmup)")
    ap.add_argument("--global-negatives", action="store_true",
                    help="pass local_negatives=False to the trainers: contrastive "
                    "in-batch negatives span the FULL global batch instead of the "
                    "per-shard block, so a --cpu-mesh run (8 shards) trains the "
                    "SAME objective as the 1-chip runs (32 negatives at --batch 4 "
                    "x 8 devices) — apples-to-apples cross-platform replication")
    ap.add_argument("--fused-compare", action="store_true",
                    help="A/B the fused-QLoRA runtime's compute dtype: rag-e2e with "
                    "bf16-dequant vs W8A8 int8 MXU compute (int8_compute='all'), "
                    "identical LoRA training otherwise — isolates the int8 quality effect")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")

    from datasets import Dataset

    from dalm_tpu.eval.retriever import evaluate_retriever
    from dalm_tpu.models.encoder import Encoder
    from dalm_tpu.models.registry import ENCODER_PRESETS, save_pretrained
    from dalm_tpu.train.rag_e2e import train_e2e
    from dalm_tpu.train.retriever_only import train_retriever

    os.makedirs(args.out, exist_ok=True)
    kw_len = tuple(int(x) for x in args.kw_len.split(","))
    arms = set(args.arms.split(","))
    if args.marginalize_k and not ({"marg", "margonly"} & arms):
        arms.add("marg")
    if args.task == "chars":
        rows = make_corpus_chars(
            args.passages, vocab_size=args.pair_vocab,
            answer_repeats=args.answer_repeats,
        )
    elif args.task == "mixed":
        assert args.vocab_json, "--task mixed requires --vocab-json (proxy meta.json)"
        with open(args.vocab_json) as f:
            meta = json.load(f)
        vocab_known = (meta["keywords"], meta["synonyms"])
        # Seed 101 is disjoint from the pretrain vocab seed (7) and from
        # every corpus seed. For syllable vocabs the NEW domain uses a
        # disjoint consonant inventory (npqrstvwz vs pretrain's
        # bcdfghjklm) — new pairs share no syllables with pretraining.
        if meta.get("vocab_style", "word") == "syll":
            vocab_new = make_vocab_syll(101, args.new_vocab, cons="npqrstvwz")
        else:
            vocab_new = make_vocab(101, args.new_vocab, tuple(meta["kw_len"]))
        rows = make_corpus_mixed(
            args.passages, vocab_known, vocab_new, known_per_doc=args.known_per_doc
        )
    else:
        rows = make_corpus(args.passages, vocab_size=args.pair_vocab, kw_len=kw_len)
    train_rows, test_rows = title_split(rows)
    n_noisy = mislabel(train_rows, args.label_noise, seed=1)
    train_ds = Dataset.from_list(train_rows)
    test_ds = Dataset.from_list(test_rows)
    print(
        f"corpus: {len(train_rows)} train ({n_noisy} mislabeled) / "
        f"{len(test_rows)} test rows; arms: {sorted(arms)}"
    )

    # One shared init seeds all runs (and serves as the "plain base
    # model" row): a fresh random init by default, or — the
    # pretrained-proxy protocol — an existing checkpoint via --base-dir.
    if args.base_dir:
        base_dir = args.base_dir
        print(f"base encoder: pretrained checkpoint {base_dir}")
    else:
        import dataclasses

        import jax.numpy as jnp

        vocab = 384  # byte tokenizer rounded to 128
        cfg = ENCODER_PRESETS[args.model]()
        cfg = dataclasses.replace(cfg, vocab_size=vocab)
        enc = Encoder(cfg)
        ids = jnp.zeros((1, args.query_len), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
        from dalm_tpu.core.mesh import unbox

        base_dir = os.path.join(args.out, "base_encoder")
        save_pretrained(base_dir, cfg, jax.device_get(unbox(params)), extra={"tokenizer": "byte"})

    common_eval = dict(
        max_length=args.passage_len, top_k=10, test_batch_size=32, query_batch_size=32
    )
    results = {}

    def eval_dir(model_dir, tag):
        ev = evaluate_retriever(test_ds, model_dir, **common_eval)
        results[tag] = {
            "recall@10": ev.recall, "hit_rate@10": ev.hit_rate,
            "precision@10": ev.precision, "n": ev.total_examples,
        }
        print(f"[{tag}] recall@10={ev.recall:.4f} hit={ev.hit_rate:.4f}")
        return ev

    t0 = time.time()
    eval_dir(base_dir, "base (pretrained proxy)" if args.base_dir else "base (random init)")

    ro_recalls, e2e_recalls, marg_recalls = [], [], []
    margonly_recalls = []
    fused_bf16_recalls, fused_int8_recalls = [], []
    for seed in range(args.seed_start, args.seed_start + args.seeds):
        if "ro" in arms:
            # Run A: retriever-only contrastive.
            ro_out = os.path.join(args.out, f"retriever_only_s{seed}")
            train_retriever(
                base_dir, train_ds, seed=seed,
                per_device_train_batch_size=args.batch, num_train_epochs=args.epochs,
                learning_rate=args.lr, query_max_len=args.query_len,
                passage_max_len=args.passage_len, output_dir=ro_out,
                with_tracking=False, use_dropout=False,
                local_negatives=not args.global_negatives, num_warmup_steps=args.warmup,
            )
            ev = eval_dir(os.path.join(ro_out, "retriever"), f"retriever-only[s{seed}]")
            ro_recalls.append(ev.recall)

        if "e2e" in arms:
            # Run B: RAG-e2e joint (same retriever init/hparams + generator).
            e2e_out = os.path.join(args.out, f"rag_e2e_s{seed}")
            train_e2e(
                train_ds, base_dir, args.generator, seed=seed,
                per_device_train_batch_size=args.batch, num_train_epochs=args.epochs,
                learning_rate=args.lr, query_max_len=args.query_len,
                passage_max_len=args.passage_len, generator_max_len=args.gen_len,
                output_dir=e2e_out, with_tracking=False, use_dropout=False,
                local_negatives=not args.global_negatives,
                num_warmup_steps=args.warmup,
            )
            ev = eval_dir(os.path.join(e2e_out, "retriever"), f"rag-e2e[s{seed}]")
            e2e_recalls.append(ev.recall)

        if "margonly" in arms and args.marginalize_k:
            # Generator-feedback-only retriever training: contrastive
            # weight 0 — isolates how much retrieval signal the
            # marginalized loss alone carries (and under label noise,
            # whether generator feedback beats corrupted contrastive
            # labels, which it can only do un-opposed: the marg
            # candidates rank the true passage top already, so there is
            # no gradient left to cancel contrastive's wrong pushes).
            mo_out = os.path.join(args.out, f"marg_only_s{seed}")
            train_e2e(
                train_ds, base_dir, args.generator, seed=seed,
                per_device_train_batch_size=args.batch, num_train_epochs=args.epochs,
                learning_rate=args.lr, query_max_len=args.query_len,
                passage_max_len=args.passage_len, generator_max_len=args.gen_len,
                output_dir=mo_out, with_tracking=False, use_dropout=False,
                local_negatives=not args.global_negatives,
                num_warmup_steps=args.warmup,
                live_index=True, marginalize_k=args.marginalize_k,
                marginalize_mode=args.marginalize_mode,
                marginalize_scale=args.marginalize_scale,
                marginalize_warmup_steps=int(
                    args.marginalize_warmup_frac * args.epochs
                    # per_device batch x data shards = global rows/step
                    * (len(train_rows) // (args.batch * jax.device_count()))
                ),
                contrastive_weight=0.0,
            )
            ev = eval_dir(os.path.join(mo_out, "retriever"), f"marg-only{args.marginalize_k}[s{seed}]")
            margonly_recalls.append(ev.recall)

        if "marg" in arms and args.marginalize_k:
            marg_out = os.path.join(args.out, f"rag_e2e_marg_s{seed}")
            train_e2e(
                train_ds, base_dir, args.generator, seed=seed,
                per_device_train_batch_size=args.batch, num_train_epochs=args.epochs,
                learning_rate=args.lr, query_max_len=args.query_len,
                passage_max_len=args.passage_len, generator_max_len=args.gen_len,
                output_dir=marg_out, with_tracking=False, use_dropout=False,
                local_negatives=not args.global_negatives,
                num_warmup_steps=args.warmup,
                live_index=True, marginalize_k=args.marginalize_k,
                marginalize_mode=args.marginalize_mode,
                marginalize_scale=args.marginalize_scale,
                marginalize_warmup_steps=int(
                    args.marginalize_warmup_frac * args.epochs
                    # per_device batch x data shards = global rows/step
                    * (len(train_rows) // (args.batch * jax.device_count()))
                ),
            )
            ev = eval_dir(os.path.join(marg_out, "retriever"), f"rag-e2e-marg{args.marginalize_k}[s{seed}]")
            marg_recalls.append(ev.recall)

        if args.fused_compare:
            # Same fused-QLoRA LoRA training twice, only the frozen-base
            # matmul precision differs (bf16 dequant vs W8A8 int8 MXU).
            for tag, mode, bucket in (
                ("fused-bf16", "none", fused_bf16_recalls),
                ("fused-int8all", "all", fused_int8_recalls),
            ):
                f_out = os.path.join(args.out, f"{tag}_s{seed}")
                train_e2e(
                    train_ds, base_dir, args.generator, seed=seed,
                    per_device_train_batch_size=args.batch, num_train_epochs=args.epochs,
                    learning_rate=args.lr, query_max_len=args.query_len,
                    passage_max_len=args.passage_len, generator_max_len=args.gen_len,
                    output_dir=f_out, with_tracking=False, use_dropout=False,
                local_negatives=not args.global_negatives,
                    num_warmup_steps=args.warmup,
                    use_peft="both", use_bnb="both", lora_runtime="fused",
                    int8_compute=mode,
                    # pin the dynamic per-row arm: this A/B's recorded
                    # rounds predate the a8_calibrate_every=16 default
                    a8_calibrate_every=0,
                )
                ev = evaluate_retriever(
                    test_ds, os.path.join(f_out, "retriever"),
                    retriever_peft_model_path=os.path.join(f_out, "retriever"),
                    **common_eval,
                )
                results[f"{tag}[s{seed}]"] = {"recall@10": ev.recall, "hit_rate@10": ev.hit_rate}
                print(f"[{tag}[s{seed}]] recall@10={ev.recall:.4f}")
                bucket.append(ev.recall)

    if ro_recalls:
        results["retriever-only"] = {"recall@10_mean": float(np.mean(ro_recalls)), "per_seed": ro_recalls}
    if e2e_recalls:
        results["rag-e2e"] = {"recall@10_mean": float(np.mean(e2e_recalls)), "per_seed": e2e_recalls}
    if marg_recalls:
        results[f"rag-e2e-marg{args.marginalize_k}"] = {
            "recall@10_mean": float(np.mean(marg_recalls)), "per_seed": marg_recalls,
        }
    if margonly_recalls:
        results[f"marg-only{args.marginalize_k}"] = {
            "recall@10_mean": float(np.mean(margonly_recalls)), "per_seed": margonly_recalls,
        }

    # Paired per-seed statistics: the decisive evidence (bootstrap 95% CI
    # of the mean delta must exclude zero; sign test as a backstop).
    stats = {}
    if ro_recalls and e2e_recalls:
        stats["e2e_vs_ro"] = paired_stats(e2e_recalls, ro_recalls)
    if marg_recalls and e2e_recalls:
        stats["marg_vs_e2e"] = paired_stats(marg_recalls, e2e_recalls)
    if marg_recalls and ro_recalls:
        stats["marg_vs_ro"] = paired_stats(marg_recalls, ro_recalls)
    if margonly_recalls and ro_recalls:
        stats["margonly_vs_ro"] = paired_stats(margonly_recalls, ro_recalls)
    if margonly_recalls and marg_recalls:
        stats["margonly_vs_marg"] = paired_stats(margonly_recalls, marg_recalls)
    if fused_bf16_recalls and fused_int8_recalls:
        stats["int8_vs_bf16"] = paired_stats(fused_int8_recalls, fused_bf16_recalls)
    if stats:
        results["paired_stats"] = stats
        for name, s in stats.items():
            print(
                f"[stats] {name}: Δ={s['mean_delta']:+.4f} "
                f"({s['wins']}W/{s['losses']}L/{s['ties']}T) "
                f"sign-p={s['sign_test_p']:.3f} "
                f"CI95=[{s['bootstrap_95ci'][0]:+.4f}, {s['bootstrap_95ci'][1]:+.4f}] "
                f"{'DECISIVE' if s['decisive'] else 'within noise'}"
            )
    if fused_bf16_recalls:
        results["fused-bf16"] = {
            "recall@10_mean": float(np.mean(fused_bf16_recalls)), "per_seed": fused_bf16_recalls,
        }
        results["fused-int8all"] = {
            "recall@10_mean": float(np.mean(fused_int8_recalls)), "per_seed": fused_int8_recalls,
        }

    results["config"] = {k: v for k, v in vars(args).items()}
    results["wall_clock_s"] = round(time.time() - t0, 1)
    out_json = os.path.join(args.out, "quality_directional.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    if ro_recalls and e2e_recalls:
        ro = results["retriever-only"]["recall@10_mean"]
        e2e = results["rag-e2e"]["recall@10_mean"]
        print(f"directional effect (rag-e2e > retriever-only): {'YES' if e2e > ro else 'NO'}")
        return 0 if e2e > ro else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
