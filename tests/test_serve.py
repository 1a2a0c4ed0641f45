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
