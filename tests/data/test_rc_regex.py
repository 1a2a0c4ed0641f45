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


def test_title_tasks_appear_with_title_column(tmp_path):
    """CSV title column → summarize wrapper uses the title template bank
    (the reference has the machinery, `regex_based.py:778-806`, but its
    driver hardwires title=None, `:1132-1134`)."""
    import csv

    path = tmp_path / "docs.csv"
    text = (ENTAIL_TEXT + " " + CAUSE_TEXT + " " + PARA_TEXT) * 2
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["body", "headline"])
        for i in range(40):  # many docs → the 0.4/0.4 summarize modes hit
            w.writerow([text, f"Distinct Headline Number {i}"])
    general = PieceVocab([WORD_BOUNDARY + "the", WORD_BOUNDARY + "and"])
    domain = PieceVocab([WORD_BOUNDARY + "retrievalmodel"])
    rc = RegexBasedReadingComprehension(general, domain)
    with_title = list(rc.dataset_generator(str(path), "body", title_column="headline"))
    assert len(with_title) >= 40
    # at least one conversation must ask for / answer with the headline
    joined = [
        " ".join(m["content"] for m in conv) for _, _, conv in with_title
    ]
    assert any("Distinct Headline Number" in j for j in joined)
    # both directions of the title family must appear (the reference's bank
    # has generate-title AND article-from-title, `regex_based.py:806-840`):
    # (a) an assistant turn that IS the headline (generate-title) …
    assert any(
        any(m["role"] == "assistant" and m["content"].startswith("Distinct Headline") for m in conv)
        for _, _, conv in with_title
    )
    # … and (b) a user turn naming the headline whose assistant reply is the
    # article body (article-from-title).
    assert any(
        any(
            m["role"] == "user"
            and "Distinct Headline Number" in m["content"]
            and i + 1 < len(conv)
            and "retrieval" in conv[i + 1]["content"]
            for i, m in enumerate(conv)
        )
        for _, _, conv in with_title
    )
    # without title_column the same corpus never mentions headlines
    without = list(rc.dataset_generator(str(path), "body"))
    joined_no = [" ".join(m["content"] for m in conv) for _, _, conv in without]
    assert not any("Distinct Headline Number" in j for j in joined_no)


def test_template_bank_richness():
    """Bank sizes documented vs the reference (`regex_based.py:163-993`)."""
    from dalm_tpu.data.rc_regex import SummarizeTask, TextCompletionTask

    nli = NLIMiner()
    entry = nli.mine(ENTAIL_TEXT)["Entail"][0]
    classify = nli.templates(entry, seed=1)  # seed 1 → classify branch is likely
    # count both branches explicitly by probing seeds
    sizes = {len(nli.templates(entry, seed=s)) for s in range(20)}
    assert max(sizes) >= 18  # classify bank
    assert min(sizes) >= 7   # generate bank
    ce = CauseEffectMiner()
    ce_entry = ce.mine(CAUSE_TEXT)["Cause-effect"][0]
    assert len(ce.templates(ce_entry, 0)) >= 9
    para = ParaphraseMiner()
    p_entry = para.mine(PARA_TEXT)["Paraphrase"][0]
    assert max(len(para.templates(p_entry, s)) for s in range(20)) >= 6
    assert len(SummarizeTask.templates_with_title) >= 7
    assert len(SummarizeTask.templates_article_from_title) >= 6
    assert len(SummarizeTask.templates_no_title) >= 7
    assert len(TextCompletionTask.templates) >= 7
    w2t = Word2TextMiner({WORD_BOUNDARY + "x"})
    assert len(w2t.templates({"keywords": ["x"], "sentence": "s"}, 0)) >= 8
