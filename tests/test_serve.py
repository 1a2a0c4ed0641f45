"""RagPipeline serving smoke: retrieve + answer + refresh."""

import numpy as np
import pytest

from dalm_tpu.serve import RagPipeline


@pytest.mark.slow
def test_pipeline_answers_and_refreshes():
    passages = [f"passage about topic {i} with unique content {i}" for i in range(12)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=4, embed_batch=8,
    )
    answers = pipe.answer(["what is topic 3", "tell me about 7"], top_k=3)
    assert len(answers) == 2
    for a in answers:
        assert len(a.passages) == 3
        assert len(a.scores) == 3
        assert isinstance(a.answer, str)
        assert a.scores[0] >= a.scores[-1]

    # retrieval is deterministic
    s1, i1 = pipe.retrieve(["what is topic 3"], top_k=3)
    s2, i2 = pipe.retrieve(["what is topic 3"], top_k=3)
    np.testing.assert_array_equal(i1, i2)

    # refresh with the same params keeps results identical
    pipe.refresh(pipe.r_params, slice_size=4)
    s3, i3 = pipe.retrieve(["what is topic 3"], top_k=3)
    np.testing.assert_array_equal(i1, i3)
    np.testing.assert_allclose(s1, s3, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_pipeline_quantized_index(mode):
    """index_quantize: retrieval works through quantized rows; refresh
    rebuilds (quantized indexes can't be row-patched in place)."""
    passages = [f"passage about topic {i} with unique content {i}" for i in range(12)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=4, embed_batch=8,
        index_quantize=mode,
    )
    assert (pipe.index.int4 if mode == "int4" else pipe.index.scales is not None)
    s1, i1 = pipe.retrieve(["what is topic 3"], top_k=3)
    assert i1.shape == (1, 3)

    # rebuild-refresh with unchanged params reproduces the same ranking
    pipe.refresh(pipe.r_params)
    assert (pipe.index.int4 if mode == "int4" else pipe.index.scales is not None)
    s2, i2 = pipe.retrieve(["what is topic 3"], top_k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_async_refresher_refuses_quantized_index():
    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.index.dense import ShardedDenseIndex
    from dalm_tpu.index.refresh import AsyncIndexRefresher

    mesh = make_mesh(MeshConfig())
    embs = np.random.default_rng(0).standard_normal((16, 64)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, embs, quantize=True)
    ids = np.zeros((16, 8), np.int32)
    with pytest.raises(ValueError, match="rebuilt"):
        AsyncIndexRefresher(index, lambda p, i, m: None, ids, ids)
