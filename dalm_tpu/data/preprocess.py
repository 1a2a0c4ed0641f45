"""Tokenize/map preprocessors — behavioral twins of the reference's
`dalm/training/utils/{retriever_only,rag_e2e}_dataloader_utils.py`.

Marker semantics preserved exactly, including the reference's marker
duplication quirk: the rag-e2e causal text interpolates the already-
prefixed ``queries``/``passages`` lists into another prefixed f-string,
producing ``#query# #query# q #passage# #passage# p #answer# a``
(`rag_e2e_dataloader_utils.py:22-23,35-37`). Parity requires keeping it —
training and eval both see the doubled markers consistently.

Outputs are fixed-length (static shapes for jit); the un-padded prefix
length ``query_passage_input_len`` marks where the answer region starts
for the marginalized loss (`:47-52,66`).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence


def preprocess_retriever_dataset(
    examples: Mapping[str, Sequence[str]],
    tokenizer: Any,
    query_column_name: str,
    passage_column_name: str,
    query_max_len: int,
    passage_max_len: int,
) -> Dict[str, Any]:
    """Twin of `retriever_only_dataloader_utils.preprocess_dataset` (:8-27)."""
    queries = [f"#query# {q}" for q in examples[query_column_name]]
    passages = [f"#passage# {p}" for p in examples[passage_column_name]]

    out: Dict[str, Any] = {}
    q_tok = tokenizer(queries, padding="max_length", max_length=query_max_len, truncation=True)
    for k, v in q_tok.items():
        out[f"query_{k}"] = v
    p_tok = tokenizer(passages, padding="max_length", max_length=passage_max_len, truncation=True)
    for k, v in p_tok.items():
        out[f"passage_{k}"] = v
    return out


def preprocess_rag_e2e_dataset(
    examples: Mapping[str, Sequence[str]],
    retriever_tokenizer: Any,
    generator_tokenizer: Any,
    query_column_name: str,
    passage_column_name: str,
    answer_column_name: str,
    query_max_len: int,
    passage_max_len: int,
    generator_max_len: int,
) -> Dict[str, Any]:
    """Twin of `rag_e2e_dataloader_utils.preprocess_dataset` (:7-68)."""
    query_list = examples[query_column_name]
    passage_list = examples[passage_column_name]
    answers = examples[answer_column_name]

    queries = [f"#query# {q}" for q in query_list]
    passages = [f"#passage# {p}" for p in passage_list]

    retriever_query_tokens = retriever_tokenizer(
        queries, padding="max_length", max_length=query_max_len, truncation=True
    )
    retriever_passage_tokens = retriever_tokenizer(
        passages, padding="max_length", max_length=passage_max_len, truncation=True
    )

    # NOTE: doubled markers — intentional parity with the reference (:35-37).
    causal_input_text = [
        f"#query# {query} #passage# {passage} #answer# {answer}"
        for passage, query, answer in zip(passages, queries, answers)
    ]
    causal_input_tokens = generator_tokenizer(
        causal_input_text, padding="max_length", max_length=generator_max_len, truncation=True
    )

    query_passage_text = [
        f"#query# {query} #passage# {passage} #answer#"
        for passage, query in zip(passages, queries)
    ]
    query_passage_tokens = generator_tokenizer(query_passage_text, padding=False)
    query_passage_lengths = [len(ids) for ids in query_passage_tokens["input_ids"]]

    pre_batch: Dict[str, Any] = {}
    for k, v in retriever_query_tokens.items():
        pre_batch[f"retriever_query_{k}"] = v
    for k, v in retriever_passage_tokens.items():
        pre_batch[f"retriever_passage_{k}"] = v
    for k, v in causal_input_tokens.items():
        pre_batch[f"generator_input_{k}"] = v
    pre_batch["query_passage_input_len"] = query_passage_lengths
    return pre_batch
