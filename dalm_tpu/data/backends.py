"""Text-generation backend for the data-generation components.

The reference loads torch HF models inline in each generator
(Qwen2.5-7B-Instruct for QA-gen, zephyr-7b-beta for synthetic RC). Here
generation is a pluggable callable ``prompts -> completions`` so the data
layer is model-agnostic; the default backend runs our own Flax decoder
with the jitted KV-cache greedy loop on the TPU mesh.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

GenerateFn = Callable[[List[str]], List[str]]


class JaxTextGenerator:
    """prompts → completions via a local decoder checkpoint.

    ``chat=True`` wraps prompts in chatml (what instruction-tuned models
    expect; the reference uses ``tokenizer.apply_chat_template``).
    """

    def __init__(
        self,
        model_spec: str,
        tokenizer: str = "byte",
        max_input_tokens: int = 512,
        max_new_tokens: int = 512,
        batch_size: int = 8,
        chat: bool = True,
        system_message: Optional[str] = None,
    ):
        import jax

        from dalm_tpu.core.mesh import unbox
        from dalm_tpu.data.tokenizer import resolve_tokenizer
        from dalm_tpu.models.registry import build_decoder
        from dalm_tpu.models.generate import build_greedy_generate
        from dalm_tpu.models.registry import resolve_decoder

        self.tok = resolve_tokenizer(tokenizer)
        self.tok.padding_side = "left"
        cfg, params = resolve_decoder(model_spec)
        self.model = build_decoder(cfg)
        if params is None:
            import jax.numpy as jnp

            logger.warning("model spec %r has no weights; random init (test mode)", model_spec)
            params = unbox(
                self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
                )["params"]
            )
        self.params = params
        self.max_input_tokens = max_input_tokens
        self.batch_size = batch_size
        self.chat = chat
        self.system_message = system_message
        self._generate = build_greedy_generate(
            self.model, max_new_tokens,
            eos_token_id=self.tok.eos_token_id, pad_token_id=self.tok.pad_token_id or 0,
        )

    def _render(self, prompt: str) -> str:
        if not self.chat:
            return prompt
        from dalm_tpu.data.sft import format_chat

        messages = []
        if self.system_message:
            messages.append({"role": "system", "content": self.system_message})
        messages.append({"role": "user", "content": prompt})
        return format_chat(messages) + "<|im_start|>assistant\n"

    def __call__(self, prompts: List[str]) -> List[str]:
        out: List[str] = []
        rendered = [self._render(p) for p in prompts]
        for start in range(0, len(rendered), self.batch_size):
            chunk = rendered[start : start + self.batch_size]
            real = len(chunk)
            if real < self.batch_size:
                chunk = chunk + [chunk[-1]] * (self.batch_size - real)
            toks = self.tok(chunk, padding="max_length", max_length=self.max_input_tokens, truncation=True)
            ids = np.asarray(toks["input_ids"], np.int32)
            mask = np.asarray(toks["attention_mask"], np.int32)
            gen = np.asarray(self._generate(self.params, ids, mask))
            for i in range(real):
                out.append(self.tok.decode(gen[i], skip_special_tokens=True))
        return out
