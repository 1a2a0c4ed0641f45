"""``dalm`` command-line interface.

Twin of `/root/reference/dalm/cli.py` (typer app, 6 commands:
``version``, ``train-rag-e2e``, ``train-retriever-only``, ``qa-gen``,
``eval-rag``, ``eval-retriever``), built on click (typer isn't in this
image; click provides the same dash-separated commands/options). Two
beyond-reference commands: ``serve`` (HTTP + OpenAI-compatible serving)
and ``train-generator`` (the reference's generator-SFT script surface,
`training/generator_only/trainer.py`, which its CLI never exposed —
with --context-parallel / --pipeline-stages / --pp-model-parallel).

Flag names mirror the reference's. TPU-native extras every command
accepts: ``--tokenizer`` (byte | local HF path), ``--model-parallel``
(mesh TP width), ``--dtype``.

The reference's broken ``qa-gen`` invocation (7 args to an 8-arg
function, SURVEY.md §7.4) works here — ``--max-input-tokens`` is a real
option with a default.
"""

from __future__ import annotations

import click

from dalm_tpu import __version__


@click.group()
def cli() -> None:
    """Domain-adapted language modeling (TPU-native)."""


@cli.command()
def version() -> None:
    """Print the current version of dalm-tpu."""
    click.echo(f"You are running DALM (dalm-tpu) version: {__version__}")


def _common_train_options(fn):
    options = [
        click.option("--passage-column-name", default="Abstract", show_default=True),
        click.option("--query-column-name", default="Question", show_default=True),
        click.option("--query-max-len", default=50, show_default=True),
        click.option("--passage-max-len", default=128, show_default=True),
        click.option("--per-device-train-batch-size", default=32, show_default=True),
        click.option("--learning-rate", default=1e-4, show_default=True),
        click.option("--logit-scale", default=100, show_default=True),
        click.option("--weight-decay", default=0.0, show_default=True),
        click.option("--num-train-epochs", default=1, show_default=True),
        click.option("--max-train-steps", default=None, type=int),
        click.option("--gradient-accumulation-steps", default=1, show_default=True),
        click.option(
            "--lr-scheduler-type",
            default="linear",
            type=click.Choice(
                ["linear", "cosine", "cosine_with_restarts", "polynomial", "constant", "constant_with_warmup"]
            ),
            show_default=True,
        ),
        click.option("--output-dir", default=None),
        click.option("--seed", default=42, show_default=True),
        click.option("--hub-model-id", default=None, help="[NOT CURRENTLY USED] parity flag"),
        click.option("--hub-token", default=None, help="[NOT CURRENTLY USED] parity flag"),
        click.option("--checkpointing-steps", default=None),
        click.option("--resume-from-checkpoint", default=None),
        click.option("--with-tracking/--no-with-tracking", default=True, show_default=True),
        click.option("--report-to", default="all", show_default=True),
        click.option("--sanity-test/--no-sanity-test", default=True, show_default=True),
        click.option("--dtype", default=None, help="compute dtype (bfloat16/float32)"),
        click.option("--model-parallel", default=1, show_default=True, help="mesh TP width"),
    ]
    for opt in reversed(options):
        fn = opt(fn)
    return fn


@cli.command("train-rag-e2e")
@click.argument("dataset_path")
@click.argument("retriever_name_or_path")
@click.argument("generator_name_or_path")
@_common_train_options
@click.option("--answer-column-name", default="Answer", show_default=True)
@click.option("--generator-max-len", default=256, show_default=True)
@click.option("--num-warmup-steps", default=100, show_default=True)
@click.option("--use-peft", default=None, type=click.Choice(["retriever", "generator", "both"]))
@click.option("--use-bnb", default=None, type=click.Choice(["retriever", "generator", "both"]),
              help="quantize sub-model weights (TPU: int8 weight-only)")
@click.option("--retriever-is-autoregressive", is_flag=True, default=False)
@click.option("--retriever-tokenizer", default="byte", show_default=True)
@click.option("--generator-tokenizer", default="byte", show_default=True)
@click.option("--lora-runtime", default="merge", type=click.Choice(["merge", "fused"]),
              show_default=True, help="fused = per-layer QLoRA (7B-scale on one chip)")
@click.option("--live-index/--no-live-index", default=False, show_default=True,
              help="continuously re-embed the passage index during training")
@click.option("--live-negatives-k", default=0, show_default=True,
              help=">0: top-k hard negatives from the live index each step")
@click.option("--marginalize-k", default=0, show_default=True,
              help=">0: TRUE top-k RAG marginalization over gold+retrieved (k x generator cost)")
@click.option("--marginalize-mode", default="token",
              type=click.Choice(["token", "sequence"]), show_default=True,
              help="RAG-token (per-answer-token posterior; strongest retrieval "
              "signal) or RAG-sequence marginalization")
@click.option("--marginalize-scale", default=None, type=float, show_default=True,
              help="candidate-posterior temperature (default: logit-scale; O(10) "
              "lets the answer likelihood steer retrieval)")
@click.option("--marginalize-warmup-steps", default=0, show_default=True,
              help=">0: first W steps use the diagonal loss (generator warmup) "
              "before TRUE top-k marginalization")
@click.option("--export-peft", is_flag=True, default=False,
              help="also write a torch-PEFT adapter next to the native one")
@click.option("--int8-compute", default="none", type=click.Choice(["none", "fwd", "all"]),
              show_default=True,
              help="run the fused frozen int8 base on the MXU int8 path (all = backward too)")
def train_rag_e2e_cmd(dataset_path, retriever_name_or_path, generator_name_or_path, **kwargs):
    """Train a retriever and generator jointly (RAG-e2e)."""
    from dalm_tpu.train.rag_e2e import train_e2e

    result = train_e2e(
        dataset_or_path=dataset_path,
        retriever_name_or_path=retriever_name_or_path,
        generator_name_or_path=generator_name_or_path,
        **kwargs,
    )
    click.echo(f"train-rag-e2e done: {result}")


@cli.command("train-retriever-only")
@click.argument("retriever_name_or_path")
@click.argument("dataset_path")
@_common_train_options
@click.option("--num-warmup-steps", default=0, show_default=True)
@click.option("--use-peft/--no-use-peft", default=False, show_default=True)
@click.option("--use-bnb/--no-use-bnb", default=False, show_default=True)
@click.option("--is-autoregressive", is_flag=True, default=False)
@click.option("--tokenizer", default="byte", show_default=True)
@click.option("--export-peft", is_flag=True, default=False,
              help="also write a torch-PEFT adapter next to the native one")
def train_retriever_only_cmd(retriever_name_or_path, dataset_path, **kwargs):
    """Contrastive fine-tuning of a retriever (in-batch negatives)."""
    from dalm_tpu.train.retriever_only import train_retriever

    result = train_retriever(
        retriever_name_or_path=retriever_name_or_path,
        dataset_or_path=dataset_path,
        **kwargs,
    )
    click.echo(f"train-retriever-only done: {result}")


@cli.command("train-generator")
@click.argument("model_name_or_path")
@click.argument("dataset_path")
@click.option("--output-dir", default="./generator_finetuned_model", show_default=True)
@click.option("--num-train-epochs", default=1, show_default=True)
@click.option("--seq-length", default=2600, show_default=True)
@click.option("--per-device-train-batch-size", default=1, show_default=True)
@click.option("--gradient-accumulation-steps", default=1, show_default=True)
@click.option("--learning-rate", default=1e-4, show_default=True)
@click.option("--lr-scheduler-type", default="cosine", show_default=True)
@click.option("--num-warmup-steps", default=100, show_default=True)
@click.option("--weight-decay", default=0.05, show_default=True)
@click.option("--eval-steps", default=200, show_default=True)
@click.option("--logging-steps", default=10, show_default=True)
@click.option("--validation-split", default=0.05, show_default=True)
@click.option("--packing/--no-packing", default=True, show_default=True)
@click.option("--use-peft/--no-use-peft", default=True, show_default=True)
@click.option("--lora-r", default=256, show_default=True)
@click.option("--lora-alpha", default=512.0, show_default=True)
@click.option("--neftune-noise-alpha", default=5.0, show_default=True)
@click.option("--tokenizer", default="byte", show_default=True)
@click.option("--dtype", default=None)
@click.option("--seed", default=42, show_default=True)
@click.option("--context-parallel", is_flag=True, default=False,
              help="sequence over the mesh `model` axis (ring attention)")
@click.option("--moe-aux-weight", default=0.0, show_default=True,
              help="Switch load-balancing aux weight for MoE generators")
@click.option("--pipeline-stages", default=0, show_default=True,
              help=">1: GPipe pipeline parallelism — layer stack over a "
                   "`stage` mesh axis (requires --no-use-peft)")
@click.option("--pp-microbatches", default=0, show_default=True,
              help="microbatches per data shard (default: local batch size)")
@click.option("--pp-model-parallel", default=1, show_default=True,
              help="TP width inside each pipeline stage (PP x TP)")
def train_generator_cmd(model_name_or_path, dataset_path, **kwargs):
    """Supervised fine-tuning of a generator (the reference's
    training/generator_only/trainer.py surface — TRL SFTTrainer twin),
    with TPU-native parallelism: --context-parallel (ring attention),
    --pipeline-stages (GPipe PP), --pp-model-parallel (PP x TP)."""
    from dalm_tpu.train.generator_only import train_generator

    result = train_generator(
        model_name=model_name_or_path,
        dataset_name=dataset_path,
        **kwargs,
    )
    click.echo(f"train-generator done: {result}")


@cli.command("qa-gen")
@click.argument("dataset_path")
@click.option("--passage-column-name", default="Abstract", show_default=True)
@click.option("--title-column-name", default="Title", show_default=True)
@click.option("--sample-size", default=1000, show_default=True)
@click.option("--batch-size", default=8, show_default=True)
@click.option("--output-dir", default="qa_gen_output", show_default=True)
@click.option("--as-csv/--as-dataset", default=True, show_default=True)
@click.option("--max-input-tokens", default=512, show_default=True)
@click.option("--model-spec", default="tiny", show_default=True, help="generator model for question writing")
@click.option("--tokenizer", default="byte", show_default=True)
def qa_gen_cmd(dataset_path, **kwargs):
    """Generate question/answer pairs from a passage dataset."""
    from dalm_tpu.data.qa_gen import generate_qa_from_disk

    generate_qa_from_disk(dataset_path=dataset_path, **kwargs)
    click.echo("qa-gen done")


def _common_eval_options(fn):
    options = [
        click.option("--passage-column-name", default="Abstract", show_default=True),
        click.option("--query-column-name", default="Question", show_default=True),
        click.option("--embed-dim", default=None, type=int, help="inferred from the model when omitted"),
        click.option("--max-length", default=128, show_default=True),
        click.option("--test-batch-size", default=8, show_default=True),
        click.option("--device", default="tpu", show_default=True, help="parity flag; the mesh decides"),
        click.option("--torch-dtype", default="bfloat16", show_default=True),
        click.option("--top-k", default=10, show_default=True),
        click.option("--index-kernel", default="xla", type=click.Choice(["xla", "pallas"]), show_default=True),
        click.option("--index-quantize", default="none",
                     type=click.Choice(["none", "int8", "int4"]), show_default=True,
                     help="index row storage: int8 = 2x corpus/HBM byte, int4 = 4x"),
    ]
    for opt in reversed(options):
        fn = opt(fn)
    return fn


@cli.command("eval-retriever")
@click.argument("dataset_path")
@click.argument("retriever_name_or_path")
@_common_eval_options
@click.option("--retriever-peft-model-path", default=None)
@click.option("--is-autoregressive", is_flag=True, default=False)
@click.option("--tokenizer", default="byte", show_default=True)
def eval_retriever_cmd(dataset_path, retriever_name_or_path, is_autoregressive, tokenizer, **kwargs):
    """Evaluate retrieval recall / precision / hit-rate."""
    from dalm_tpu.eval.retriever import evaluate_retriever

    results = evaluate_retriever(
        dataset_or_path=dataset_path,
        retriever_name_or_path=retriever_name_or_path,
        is_autoregressive=is_autoregressive,
        tokenizer=tokenizer,
        **kwargs,
    )
    click.echo(results.model_dump_json())


@cli.command("eval-rag")
@click.argument("dataset_path")
@click.argument("retriever_name_or_path")
@click.argument("generator_name_or_path")
@_common_eval_options
@click.option("--retriever-peft-model-path", default=None)
@click.option("--generator-peft-model-path", default=None)
@click.option("--answer-column-name", default="Answer", show_default=True)
@click.option("--query-batch-size", default=16, show_default=True)
@click.option("--evaluate-generator/--no-evaluate-generator", default=True, show_default=True)
@click.option("--retriever-is-autoregressive", is_flag=True, default=False)
@click.option("--retriever-tokenizer", default="byte", show_default=True)
@click.option("--generator-tokenizer", default="byte", show_default=True)
@click.option("--max-new-tokens", default=64, show_default=True)
def eval_rag_cmd(dataset_path, retriever_name_or_path, generator_name_or_path, **kwargs):
    """Evaluate retrieval + generator exact-match."""
    from dalm_tpu.eval.rag import evaluate_rag

    results = evaluate_rag(
        dataset_or_path=dataset_path,
        retriever_name_or_path=retriever_name_or_path,
        generator_name_or_path=generator_name_or_path,
        **kwargs,
    )
    click.echo(results.model_dump_json())


@cli.command("serve")
@click.argument("retriever_name_or_path")
@click.argument("generator_name_or_path")
@click.option("--passages", "passages_path", required=True,
              help="corpus file: .txt (one passage per line) or .csv (passage column)")
@click.option("--passage-column-name", default="Abstract", show_default=True)
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8080, show_default=True)
@click.option("--num-slots", default=32, show_default=True,
              help="continuous-batching decode slots")
@click.option("--max-new-tokens", default=64, show_default=True)
@click.option("--max-prompt-len", default=256, show_default=True)
@click.option("--retriever-peft-path", default=None)
@click.option("--generator-peft-path", default=None)
@click.option("--retriever-tokenizer", default="byte", show_default=True)
@click.option("--generator-tokenizer", default="byte", show_default=True)
@click.option("--quantize-generator/--no-quantize-generator", default=False, show_default=True,
              help="int8 generator weights (HBM-bound decode: ~2x tokens/sec)")
@click.option("--kv-quant/--no-kv-quant", default=False, show_default=True,
              help="int8 KV cache (halves cache HBM traffic; 2x slot budget)")
@click.option("--index-quantize", default="none",
              type=click.Choice(["none", "int8", "int4"]), show_default=True,
              help="index row storage: int8 = 2x corpus/HBM byte, int4 = 4x")
@click.option("--prefill-chunk", default=0, show_default=True,
              help="blocked admission prefill in C-column chunks (0 = whole "
                   "prompt at once); at long --max-prompt-len the one-shot "
                   "prefill's intermediates OOM before the KV cache does")
@click.option("--temperature", default=0.0, show_default=True,
              help="0 = greedy; >0 samples (keys per request+position)")
@click.option("--sampling-top-k", default=0, show_default=True)
@click.option("--sampling-top-p", default=1.0, show_default=True)
@click.option("--sampling-seed", default=0, show_default=True)
def serve_cmd(retriever_name_or_path, generator_name_or_path, passages_path,
              passage_column_name, host, port, num_slots, max_new_tokens,
              max_prompt_len, retriever_peft_path, generator_peft_path,
              retriever_tokenizer, generator_tokenizer, quantize_generator,
              kv_quant, index_quantize, prefill_chunk, temperature,
              sampling_top_k, sampling_top_p, sampling_seed):
    """Serve RAG answers over HTTP (beyond the reference — it has no
    serving surface): POST /answer for full answers, POST /stream for
    token streaming, GET /healthz; plus an OpenAI-compatible surface
    (/v1/chat/completions incl. SSE streaming, /v1/completions,
    /v1/models) for openai-SDK clients pointed at base_url=/v1."""
    if passages_path.endswith(".csv"):
        import csv as _csv

        with open(passages_path, newline="") as f:
            passages = [row[passage_column_name] for row in _csv.DictReader(f)]
    else:
        with open(passages_path) as f:
            passages = [ln.strip() for ln in f if ln.strip()]
    click.echo(f"loaded {len(passages)} passages from {passages_path}")

    from dalm_tpu.models.sampling import SamplerConfig
    from dalm_tpu.serve import RagPipeline
    from dalm_tpu.server_http import serve_pipeline

    sampler = (
        SamplerConfig(temperature=temperature, top_k=sampling_top_k,
                      top_p=sampling_top_p, seed=sampling_seed)
        if temperature > 0 else None
    )
    pipe = RagPipeline.from_pretrained(
        retriever_name_or_path, generator_name_or_path, passages,
        retriever_peft_path=retriever_peft_path,
        generator_peft_path=generator_peft_path,
        retriever_tokenizer=retriever_tokenizer,
        generator_tokenizer=generator_tokenizer,
        max_prompt_len=max_prompt_len, max_new_tokens=max_new_tokens,
        quantize_generator=quantize_generator, kv_quant=kv_quant,
        sampler=sampler, index_quantize=index_quantize,
        prefill_chunk=prefill_chunk or None,
    )
    serve_pipeline(pipe, host=host, port=port, num_slots=num_slots)


def main() -> None:
    cli()


if __name__ == "__main__":
    main()
