"""RAG serving: retrieve → prompt → generate, production-shaped.

The reference has no serving path — retrieval + generation exist only
inside eval scripts (`eval_rag.py`). Here the trained artifacts compose
into a reusable pipeline:

- the passage corpus is embedded once into the sharded HBM index
  (Pallas search kernel on TPU);
- queries batch through one jitted embed + search + greedy-decode pass;
- ``refresh(new_retriever_params)`` re-embeds the corpus in place via
  the async refresher (serving keeps answering from the previous
  complete snapshot while the refresh sweeps).

Usage::

    pipe = RagPipeline.from_pretrained("out/retriever", "out/generator",
                                       passages=corpus_list)
    answers = pipe.answer(["what is ..?", ...], top_k=4)
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence

import jax
import numpy as np

from dalm_tpu.core.mesh import MeshConfig, make_mesh, unbox
from dalm_tpu.data.tokenizer import resolve_tokenizer
from dalm_tpu.eval.retriever import build_embed_fn, load_retriever_for_eval
from dalm_tpu.index.dense import ShardedDenseIndex
from dalm_tpu.models.generate import build_greedy_generate
from dalm_tpu.models.registry import build_decoder, resolve_decoder

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class RagAnswer:
    query: str
    answer: str
    passages: List[str]
    scores: List[float]


class RagPipeline:
    def __init__(
        self,
        retriever_model,
        retriever_params,
        retriever_tok,
        generator,
        generator_params,
        generator_tok,
        passages: Sequence[str],
        mesh=None,
        max_passage_len: int = 128,
        max_prompt_len: int = 256,
        max_new_tokens: int = 64,
        embed_batch: int = 64,
        index_kernel: str = "auto",  # pallas on TPU, xla elsewhere
        index_quantize: "bool | str" = False,  # True/"int8" = int8 rows, "int4" = nibble rows
        quantize_generator: "bool | str" = False,  # True = int8, "int4" = 4-bit
        kv_quant: bool = False,  # int8 KV cache (per-token/head scales)
        sampler=None,  # models.sampling.SamplerConfig; None = greedy
        speculative: bool = False,  # prompt-lookup speculative decode (greedy only)
        speculative_gamma: int = 8,
        prefill_chunk: "int | None" = None,  # blocked admission prefill (long prompts)
        admit_width: "int | None" = None,  # compact-width fused admission
    ):
        """``quantize_generator``: pack the generator's big kernels into
        int8 `quant` storage (models/qlora.py). Decode is HBM-bandwidth
        bound, so halving weight bytes ≈ 2× decode throughput and 2×
        models per chip; dequant fuses into each matmul (weight-only —
        activations stay in compute dtype)."""
        if kv_quant:
            # int8 KV-cache tier (DecoderConfig.kv_quant): halves cached
            # decode's K/V HBM traffic and doubles the slot budget. The
            # flag lives on the config, so every decode path downstream
            # (greedy/speculative lockstep, continuous batching,
            # streaming) picks it up via init_kv_cache.
            import dataclasses as _dc

            if not hasattr(generator.cfg, "kv_quant"):
                raise ValueError(
                    "kv_quant requires a models.decoder.Decoder generator"
                )
            generator = generator.clone(
                cfg=_dc.replace(generator.cfg, kv_quant=True)
            )
        self.mesh = mesh or make_mesh(MeshConfig())
        self.retriever = retriever_model
        self.r_params = retriever_params
        self.r_tok = retriever_tok
        self.generator = generator
        self.g_params = generator_params
        self.g_tok = generator_tok
        self.g_tok.padding_side = "left"
        self.passages = list(passages)
        self.max_passage_len = max_passage_len
        self.max_prompt_len = max_prompt_len
        self.embed_batch = embed_batch
        self._max_new_tokens = max_new_tokens

        self._g_extra: dict = {}
        if quantize_generator:
            from dalm_tpu.models.qlora import pack_qlora_frozen

            self.g_params, g_quant = pack_qlora_frozen(
                self.g_params, quantize=quantize_generator
            )
            self._g_extra = {"quant": g_quant}

        from dalm_tpu.models.sampling import resolve

        self.sampler = resolve(sampler)
        self._embed = build_embed_fn(self.retriever, self.r_params)
        self._spec_gamma = speculative_gamma if speculative else 0
        # Blocked admission prefill (models/decode_engine.py): at long
        # max_prompt_len the one-shot (pool, P) prefill's intermediates
        # OOM before the KV cache does; C-column chunks bound them.
        self._prefill_chunk = prefill_chunk
        self._admit_width = admit_width
        if speculative:
            # Prompt-lookup speculative decode (models/speculative.py):
            # RAG answers quote passages, so drafts verify in spans — a
            # trained generator measured 3.3 tokens per verification pass.
            # With a sampler, verification is rejection sampling (each
            # emitted token follows EXACTLY the sampler's distribution;
            # greedy remains bit-exact vs build_greedy_generate).
            from dalm_tpu.models.speculative import build_speculative_generate

            self._generate = build_speculative_generate(
                self.generator, max_new_tokens,
                eos_token_id=self.g_tok.eos_token_id,
                pad_token_id=self.g_tok.pad_token_id or 0,
                gamma=speculative_gamma,
                extra_collections=self._g_extra,
                sampler=self.sampler,
            )
        else:
            self._generate = build_greedy_generate(
                self.generator, max_new_tokens,
                eos_token_id=self.g_tok.eos_token_id,
                pad_token_id=self.g_tok.pad_token_id or 0,
                extra_collections=self._g_extra,
                sampler=self.sampler,
            )
        embs = self._embed_texts([f"#passage# {p}" for p in self.passages], max_passage_len)
        self.index = ShardedDenseIndex.build(
            self.mesh, embs, kernel=index_kernel, quantize=index_quantize
        )
        self.refresher = None

    # ---- construction ----------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        retriever_path: str,
        generator_path: str,
        passages: Sequence[str],
        retriever_peft_path: Optional[str] = None,
        generator_peft_path: Optional[str] = None,
        retriever_tokenizer: str = "byte",
        generator_tokenizer: str = "byte",
        retriever_is_autoregressive: bool = False,
        **kw,
    ) -> "RagPipeline":
        retriever, r_params, r_tok = load_retriever_for_eval(
            retriever_path, retriever_peft_path, retriever_is_autoregressive,
            None, retriever_tokenizer,
        )
        g_cfg, g_params = resolve_decoder(generator_path)
        generator = build_decoder(g_cfg)
        if g_params is None:
            import jax.numpy as jnp

            g_params = unbox(
                generator.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
                )["params"]
            )
        if generator_peft_path:
            from dalm_tpu.models.lora import load_adapter, merge_lora

            lora_params, spec = load_adapter(generator_peft_path)
            g_params = merge_lora(g_params, lora_params, spec)
        g_tok = resolve_tokenizer(generator_tokenizer)
        return cls(retriever, r_params, r_tok, generator, g_params, g_tok, passages, **kw)

    # ---- internals -------------------------------------------------------
    def _embed_texts(self, texts: Sequence[str], max_len: int) -> np.ndarray:
        out = np.zeros((len(texts), self.retriever.embedding_dim), np.float32)
        for start in range(0, len(texts), self.embed_batch):
            chunk = list(texts[start : start + self.embed_batch])
            real = len(chunk)
            if real < self.embed_batch:
                chunk += [chunk[-1]] * (self.embed_batch - real)
            toks = self.r_tok(chunk, padding="max_length", max_length=max_len, truncation=True)
            embs = self._embed(
                np.asarray(toks["input_ids"], np.int32),
                np.asarray(toks["attention_mask"], np.int32),
            )
            out[start : start + real] = np.asarray(embs, np.float32)[:real]
        return out

    # ---- API -------------------------------------------------------------
    def retrieve(self, queries: Sequence[str], top_k: int = 4):
        q_embs = self._embed_texts([f"#query# {q}" for q in queries], self.max_passage_len)
        scores, ids = self.index.search(q_embs, top_k)
        return scores, ids

    def answer(self, queries: Sequence[str], top_k: int = 4) -> List[RagAnswer]:
        scores, ids = self.retrieve(queries, top_k)
        prompts = [
            f"#query# {q} #passage# {self.passages[int(ids[i, 0])]} #answer# "
            for i, q in enumerate(queries)
        ]
        toks = self.g_tok(prompts, padding="max_length", max_length=self.max_prompt_len, truncation=True)
        gen = np.asarray(
            self._generate(
                self.g_params,
                np.asarray(toks["input_ids"], np.int32),
                np.asarray(toks["attention_mask"], np.int32),
            )
        )
        results = []
        for i, q in enumerate(queries):
            text = self.g_tok.decode(gen[i], skip_special_tokens=True)
            answer = text.split("#answer#")[0].strip()
            results.append(
                RagAnswer(
                    query=q,
                    answer=answer,
                    passages=[self.passages[int(j)] for j in ids[i]],
                    scores=[float(s) for s in scores[i]],
                )
            )
        return results

    def answer_continuous(
        self,
        queries: Sequence[str],
        top_k: int = 4,
        num_slots: int = 32,
        max_new_tokens: Optional[int] = None,
        decode_chunk: int = 8,
    ) -> List[RagAnswer]:
        """`answer` with continuous batching: a fixed pool of decode
        slots; slots whose answers hit EOS are immediately recycled to
        waiting queries, so short answers never pay for long ones.
        Use when ``len(queries)`` exceeds a comfortable lockstep batch
        or answer lengths are ragged (models/decode_engine.py)."""
        from dalm_tpu.models.decode_engine import DecodeEngine

        max_new = max_new_tokens or self._max_new_tokens
        key = (num_slots, max_new, decode_chunk)
        if getattr(self, "_engine_key", None) != key:
            self._engine = DecodeEngine(
                self.generator, self.g_params,
                num_slots=num_slots, max_prompt_len=self.max_prompt_len,
                max_new_tokens=max_new,
                eos_token_id=self.g_tok.eos_token_id,
                pad_token_id=self.g_tok.pad_token_id or 0,
                decode_chunk=decode_chunk,
                extra_collections=self._g_extra,
                sampler=self.sampler,
                speculative_gamma=self._spec_gamma,
                prefill_chunk=self._prefill_chunk,
                admit_width=self._admit_width,
            )
            self._engine_key = key

        scores, ids = self.retrieve(queries, top_k)
        prompts = [
            f"#query# {q} #passage# {self.passages[int(ids[i, 0])]} #answer# "
            for i, q in enumerate(queries)
        ]
        toks = self.g_tok(prompts, padding="max_length", max_length=self.max_prompt_len, truncation=True)
        # All queries are known upfront here, so the fully-fused on-device
        # schedule applies (one dispatch, one readback); the host-loop
        # `DecodeEngine.generate` remains for streaming arrivals.
        token_lists = self._engine.generate_fused(
            np.asarray(toks["input_ids"], np.int32),
            np.asarray(toks["attention_mask"], np.int32),
        )
        results = []
        for i, q in enumerate(queries):
            text = self.g_tok.decode(token_lists[i], skip_special_tokens=True)
            results.append(
                RagAnswer(
                    query=q,
                    answer=text.split("#answer#")[0].strip(),
                    passages=[self.passages[int(j)] for j in ids[i]],
                    scores=[float(s) for s in scores[i]],
                )
            )
        return results

    def stream(
        self,
        num_slots: int = 32,
        max_new_tokens: Optional[int] = None,
        decode_chunk: int = 8,
    ) -> "RagStreamSession":
        """Online serving: a context-managed session whose ``submit(query)``
        returns immediately with a handle that streams answer tokens as
        they decode. Requests arriving mid-flight join the slot pool via
        continuous batching (models/streaming.py).

        A pipeline built with ``speculative=True`` streams through the
        online host-draft verification rounds (multi-token commits per
        round; exact greedy output)::

            with pipe.stream(num_slots=32) as session:
                h = session.submit("what is ..?")
                print(h.answer())        # or: for tok in h.tokens(): ...
        """
        from dalm_tpu.models.decode_engine import DecodeEngine

        max_new = max_new_tokens or self._max_new_tokens
        engine = DecodeEngine(
            self.generator, self.g_params,
            num_slots=num_slots, max_prompt_len=self.max_prompt_len,
            max_new_tokens=max_new,
            eos_token_id=self.g_tok.eos_token_id,
            pad_token_id=self.g_tok.pad_token_id or 0,
            decode_chunk=decode_chunk,
            extra_collections=self._g_extra,
            sampler=self.sampler,
            speculative_gamma=self._spec_gamma,
            prefill_chunk=self._prefill_chunk,
        )
        return RagStreamSession(self, engine)

    def refresh(self, new_retriever_params, slice_size: int = 256) -> None:
        """Swap in updated retriever weights and re-embed the corpus
        (incremental; serving continues from the previous snapshot).

        Quantized (int8/int4) indexes can't be row-patched in place —
        they are re-embedded and rebuilt in one pass (serving answers
        from the old index until the pointer swap)."""
        from dalm_tpu.index.refresh import AsyncIndexRefresher

        self.r_params = new_retriever_params
        self._embed = build_embed_fn(self.retriever, self.r_params)
        if self.index.scales is not None or self.index.int4:
            embs = self._embed_texts(
                [f"#passage# {p}" for p in self.passages], self.max_passage_len
            )
            quantize = "int4" if self.index.int4 else True
            self.index = ShardedDenseIndex.build(
                self.mesh, embs, kernel=self.index.kernel, quantize=quantize
            )
            return
        texts = [f"#passage# {p}" for p in self.passages]
        toks = self.r_tok(texts, padding="max_length", max_length=self.max_passage_len, truncation=True)
        ids = np.asarray(toks["input_ids"], np.int32)
        mask = np.asarray(toks["attention_mask"], np.int32)

        embed_fn = jax.jit(lambda params, i, m: self.retriever.embed(params, i, m))
        refresher = AsyncIndexRefresher(self.index, embed_fn, ids, mask, slice_size=slice_size)
        refresher.refresh_fully(self.r_params)


class RagStreamHandle:
    """One streaming RAG request: retrieval context + a token stream."""

    def __init__(self, query: str, passages: List[str], scores: List[float], handle, tokenizer):
        self.query = query
        self.passages = passages
        self.scores = scores
        self._handle = handle
        self._tok = tokenizer

    def tokens(self):
        """Yield generator token ids as they decode (blocking iterator)."""
        return self._handle.tokens()

    def answer(self, timeout: Optional[float] = None) -> str:
        """Block until decode finishes; returns the parsed answer text."""
        ids = self._handle.result(timeout)
        text = self._tok.decode(ids, skip_special_tokens=True)
        return text.split("#answer#")[0].strip()

    def cancel(self) -> None:
        self._handle.cancel()

    @property
    def done(self) -> bool:
        return self._handle.done


class RagStreamSession:
    """Context-managed online RAG serving (see :meth:`RagPipeline.stream`).

    ``submit`` is thread-safe and returns immediately; the scheduler
    thread owns the decode engine and admits requests mid-flight."""

    def __init__(self, pipe: RagPipeline, engine):
        from dalm_tpu.models.streaming import StreamingEngine

        self._pipe = pipe
        self._server = StreamingEngine(engine)
        self._started = False

    def __enter__(self) -> "RagStreamSession":
        self._server.start()
        self._started = True
        return self

    def __exit__(self, *exc) -> None:
        self._server.stop(drain=True)

    def submit(self, query: str, top_k: int = 4, budget: Optional[int] = None) -> RagStreamHandle:
        if not self._started:
            raise RuntimeError("use `with pipe.stream(...) as session:`")
        pipe = self._pipe
        scores, ids = pipe.retrieve([query], top_k)
        passages = [pipe.passages[int(j)] for j in ids[0]]
        prompt = f"#query# {query} #passage# {passages[0]} #answer# "
        toks = pipe.g_tok(
            [prompt], padding="max_length", max_length=pipe.max_prompt_len, truncation=True
        )
        handle = self._server.submit(
            np.asarray(toks["input_ids"], np.int32),
            np.asarray(toks["attention_mask"], np.int32),
            budget=budget,
        )
        return RagStreamHandle(
            query, passages, [float(s) for s in scores[0]], handle, pipe.g_tok
        )
