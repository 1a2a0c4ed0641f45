"""Regex RC mining + composition tests."""


from dalm_tpu.data.rc_regex import (
    CauseEffectMiner,
    NLIMiner,
    ParaphraseMiner,
    RegexBasedReadingComprehension,
    Word2TextMiner,
)
from dalm_tpu.data.spm import PieceVocab, UnigramPieceTokenizer, WORD_BOUNDARY, domain_keywords

ENTAIL_TEXT = (
    "Start sentence here. "
    "The retrieval model was trained with large batches of in-batch negatives today. "
    "Therefore, the ranking quality improved substantially across every evaluation we ran. "
    "More text."
)

CAUSE_TEXT = (
    "Intro words. "
    "The index rebuild became four times faster after the kernel change last week. "
    "Hence, the nightly evaluation pipeline completed well before the morning deadline. "
    "Tail."
)

PARA_TEXT = (
    "Lead-in. "
    "The embedding matrix is distributed across every accelerator in the pod for capacity. "
    "In other words, no single chip needs to hold the entire passage index in memory. "
    "End."
)


def test_nli_miner_finds_entailment():
    mined = NLIMiner().mine(ENTAIL_TEXT)
    assert len(mined["Entail"]) == 1
    entry = mined["Entail"][0]
    assert entry["verbalizer"].lower() == "therefore"
    assert "retrieval model" in entry["premise"]
    assert "ranking quality" in entry["hypothesis"]


def test_nli_demo_is_chatml_pair():
    entry = NLIMiner().mine(ENTAIL_TEXT)["Entail"][0]
    demo = NLIMiner().format_demo(entry, seed=0)
    assert [m["role"] for m in demo] == ["user", "assistant"]
    assert demo[0]["content"]


def test_cause_effect_miner():
    mined = CauseEffectMiner().mine(CAUSE_TEXT)
    assert len(mined["Cause-effect"]) == 1


def test_paraphrase_miner():
    mined = ParaphraseMiner().mine(PARA_TEXT)
    assert len(mined["Paraphrase"]) == 1


def test_word2text_miner_with_keywords():
    kws = {WORD_BOUNDARY + "hippocampal", WORD_BOUNDARY + "neocortical", WORD_BOUNDARY + "consolidation"}
    miner = Word2TextMiner(kws)
    text = "The hippocampal and neocortical circuits drive consolidation during sleep. Unrelated sentence."
    mined = miner.mine(text)
    assert len(mined["Word2Text"]) == 1
    assert len(mined["Word2Text"][0]["keywords"]) == 3


def test_domain_keywords_diff():
    general = PieceVocab([WORD_BOUNDARY + "common", WORD_BOUNDARY + "sharedlongword"])
    domain = PieceVocab(
        [WORD_BOUNDARY + "sharedlongword", WORD_BOUNDARY + "electrocardiogram", "suffix", WORD_BOUNDARY + "short"]
    )
    kws = domain_keywords(general, domain, min_len=10)
    assert kws == {WORD_BOUNDARY + "electrocardiogram"}


def test_unigram_tokenizer_trains_and_roundtrips():
    lines = [f"domain specific electrocardiogram reading number {i}" for i in range(50)]
    tok = UnigramPieceTokenizer.train(iterator=lines, vocab_size=200)
    ids = tok.encode("electrocardiogram reading")
    assert len(ids) > 0
    assert "electrocardiogram" in tok.decode(ids)


def test_end_to_end_generate(tmp_path):
    # build tiny input corpus + vocabs
    text = ENTAIL_TEXT + " " + CAUSE_TEXT + " " + PARA_TEXT
    f = tmp_path / "doc.txt"
    f.write_text(text * 2)
    general = PieceVocab([WORD_BOUNDARY + "the", WORD_BOUNDARY + "and"])
    domain = PieceVocab([WORD_BOUNDARY + "retrievalmodel"])
    rc = RegexBasedReadingComprehension(general, domain)
    results = list(rc.dataset_generator(str(tmp_path)))
    assert len(results) >= 1
    _, fname, conversation = results[0]
    assert fname == "doc.txt"
    roles = [m["role"] for m in conversation]
    assert roles[0] == "user"
    # alternating or at least containing assistant turns
    assert "assistant" in roles
    # determinism: same input → same output
    results2 = list(rc.dataset_generator(str(tmp_path)))
    assert results == results2
