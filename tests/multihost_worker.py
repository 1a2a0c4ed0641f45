"""Worker process for the real multi-process test in test_multihost.py.

Each worker is a fresh interpreter that joins a gloo-backed
`jax.distributed` world over CPU devices (`jax_num_cpu_devices` local
devices per process) and runs the actual `train_retriever` trainer —
the same code path a TPU pod host would run. Invoked as:

    python tests/multihost_worker.py <pid> <nprocs> <port> <csv> <out> \
        <result_json> <local_devices> [<trainer>]

``trainer``: "retriever" (default), "e2e_fused" (the flagship
`train_e2e` with local-negatives blocking + the fused-QLoRA runtime —
the round-4 VERDICT #4 surface), or "generator" (`train_generator`;
<csv> is then a saved `messages` dataset dir).

With nprocs=1 it runs the identical config single-process (no
distributed init) so the test can assert DP-invariance: a 2-process x
2-device run must produce the same loss trajectory as 1 process x 4
devices. Mirrors the reference's DDP scale-out contract
(`train_rage2e.py:416-418`) where world size never changes the math.
"""

import json
import os
import sys


def main() -> None:
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    csv, out, result_path = sys.argv[4], sys.argv[5], sys.argv[6]
    local_devices = int(sys.argv[7])
    trainer = sys.argv[8] if len(sys.argv) > 8 else "retriever"

    os.environ["JAX_PLATFORMS"] = "cpu"
    # per-process HF datasets cache: avoid cross-process lock contention
    os.environ["HF_DATASETS_CACHE"] = os.path.join(out, f"hfcache{pid}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    # parity with tests/conftest.py: deterministic fp32 matmuls
    jax.config.update("jax_default_matmul_precision", "float32")
    if n > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from dalm_tpu.core.multihost import initialize_distributed

        # explicit-args path; the trainer's own initialize_distributed()
        # call must then be an idempotent no-op
        initialize_distributed(f"localhost:{port}", num_processes=n, process_id=pid)

    if trainer == "e2e_fused":
        from dalm_tpu.train.rag_e2e import train_e2e

        result = train_e2e(
            csv,
            "tiny",
            "tiny",
            per_device_train_batch_size=2,
            num_train_epochs=2,
            output_dir=out,
            query_max_len=16,
            passage_max_len=16,
            generator_max_len=48,
            with_tracking=True,
            use_dropout=False,
            checkpointing_steps="epoch",
            # the surfaces under test: block-diagonal local negatives
            # interacting with per-process batch assembly, and the
            # fused-QLoRA packed runtime
            local_negatives=True,
            use_peft="both",
            use_bnb="both",
            lora_runtime="fused",
        )
    elif trainer == "generator":
        from dalm_tpu.train.generator_only import train_generator

        result = train_generator(
            "tiny",
            csv,
            local_dataset=True,
            output_dir=out,
            num_train_epochs=2,
            seq_length=64,
            per_device_train_batch_size=1,
            eval_steps=0,
            logging_steps=2,
            validation_split=0.2,
            lora_r=4,
            lora_alpha=8,
            use_peft=True,
            gradient_checkpointing=False,
            # NEFTune noise and dropout masks are rng-stream artifacts
            # that differ under different world sizes (the reference's
            # DDP makes the same exclusion: per-process rng), so both
            # are excluded from the DP-equality contract.
            neftune_noise_alpha=0,
            lora_dropout=0.0,
        )
    else:
        from dalm_tpu.train.retriever_only import train_retriever

        result = train_retriever(
            "tiny",
            csv,
            per_device_train_batch_size=2,
            num_train_epochs=2,
            output_dir=out,
            query_max_len=16,
            passage_max_len=16,
            with_tracking=True,
            use_dropout=False,
            checkpointing_steps="epoch",
        )
    with open(result_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "final_loss": result["final_loss"],
                "steps": result["steps"],
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
            },
            f,
        )


if __name__ == "__main__":
    main()
