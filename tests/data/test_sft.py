"""SFT data prep: chatml formatting, packing, chars/token."""

import numpy as np

from dalm_tpu.data.sft import chars_token_ratio, format_chat, pack_dataset, prepare_sample_text
from dalm_tpu.data.tokenizer import ByteTokenizer


def test_format_chat_roundtrip_roles():
    text = format_chat(
        [{"role": "user", "content": "hi"}, {"role": "assistant", "content": "hello"}]
    )
    assert "<|im_start|>user\nhi<|im_end|>" in text
    assert "<|im_start|>assistant\nhello<|im_end|>" in text


def test_prepare_sample_text_malformed_returns_empty():
    assert prepare_sample_text({"not_messages": 1}) == ""


def test_pack_dataset_fixed_blocks():
    tok = ByteTokenizer()
    rows = [{"messages": [{"role": "user", "content": "x" * 50}]} for _ in range(20)]
    blocks = pack_dataset(rows, tok, seq_length=64)
    assert blocks.ndim == 2 and blocks.shape[1] == 64
    assert blocks.dtype == np.int32
    # EOS separators present
    assert (blocks == tok.eos_token_id).any()


def test_pack_dataset_drops_short_tail():
    tok = ByteTokenizer()
    rows = [{"messages": [{"role": "user", "content": "abc"}]}]
    blocks = pack_dataset(rows, tok, seq_length=10_000)
    assert len(blocks) == 0  # too little text for one block


def test_chars_token_ratio_bytes_is_near_one():
    tok = ByteTokenizer()
    rows = [{"messages": [{"role": "user", "content": "hello world"}]} for _ in range(5)]
    ratio = chars_token_ratio(rows, tok, sample_size=5)
    assert 0.9 < ratio <= 1.1  # byte tokenizer ≈ 1 char/token


def test_pad_dataset_per_sample_padding():
    from dalm_tpu.data.sft import pad_dataset

    tok = ByteTokenizer()
    rows = [
        {"messages": [{"role": "user", "content": "x" * 10}]},
        {"messages": [{"role": "user", "content": "y" * 200}]},  # truncated
        {"not_messages": 1},  # skipped
    ]
    ids, mask = pad_dataset(rows, tok, seq_length=64)
    assert ids.shape == (2, 64) and mask.shape == (2, 64)
    # row 0: short → padded, mask ends in zeros, pad ids in tail
    assert mask[0, -1] == 0 and ids[0, -1] == tok.pad_token_id
    assert mask[0, 0] == 1
    # short row is EOS-terminated at the boundary
    n0 = int(mask[0].sum())
    assert ids[0, n0 - 1] == tok.eos_token_id
    # row 1: long → truncated, fully unmasked
    assert mask[1].all()


def test_pad_dataset_empty():
    from dalm_tpu.data.sft import pad_dataset

    tok = ByteTokenizer()
    ids, mask = pad_dataset([], tok, seq_length=16)
    assert ids.shape == (0, 16)
