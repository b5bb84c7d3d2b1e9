"""Fine-tune a VPT policy on contractor recordings
(reference: behavioural_cloning.py).

CLI-compatible with the reference (--data-dir/--in-model/--in-weights/
--out-weights).  Training is the TPU-native upgrade: sequence-chunked (T=128)
batches under a data-parallel mesh, instead of the reference's per-sample
gradient accumulation.  ``--chunk-len 1`` reproduces the reference's
single-step loss semantics for parity checks.
"""

from argparse import ArgumentParser

from vpt_tpu.training.bc import BCHyperparams, BCTrainer


def behavioural_cloning_train(data_dir, in_model, in_weights, out_weights,
                              batch_size=8, chunk_len=128, epochs=2,
                              checkpoint_dir=None, checkpoint_every=0,
                              resume=False, compute_dtype="float32", remat=False, cnn_scan_chunks=0,
                              fsdp=1, sp=1, tp=1, qat_dense=False, labels_dir=None):
    from vpt_tpu.parallel.mesh import maybe_initialize_distributed

    # multi-host pod launch (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID set):
    # must run before anything touches the XLA backend so the default mesh
    # spans all hosts and BCTrainer.train's per-process data sharding engages
    maybe_initialize_distributed()
    hp = BCHyperparams(
        batch_size=batch_size,
        chunk_len=chunk_len,
        epochs=epochs,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    mesh = None
    if fsdp > 1 or sp > 1 or tp > 1:
        from vpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_fsdp=fsdp, n_sp=sp, n_tp=tp)
    trainer = BCTrainer.from_files(in_model, in_weights, hp=hp, compute_dtype=compute_dtype, remat=remat,
                                   cnn_scan_chunks=cnn_scan_chunks, mesh=mesh, qat_dense=qat_dense)
    steps = trainer.train(
        data_dir,
        out_weights,
        resume_dir=checkpoint_dir if resume else None,
        labels_dir=labels_dir,
    )
    print(f"Finished: {steps} optimizer steps → {out_weights}")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--data-dir", type=str, required=True, help="Path to the directory containing recordings to be trained on")
    parser.add_argument("--in-model", required=True, type=str, help="Path to the .model file to be finetuned")
    parser.add_argument("--in-weights", required=True, type=str, help="Path to the .weights file to be finetuned")
    parser.add_argument("--out-weights", required=True, type=str, help="Path where finetuned weights will be saved")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--chunk-len", type=int, default=128, help="Sequence window length (1 = reference single-step mode)")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--checkpoint-dir", type=str, default=None, help="Mid-run checkpoint directory")
    parser.add_argument("--checkpoint-every", type=int, default=0, help="Steps between mid-run checkpoints")
    parser.add_argument("--resume", action="store_true", help="Resume from the latest checkpoint in --checkpoint-dir")
    parser.add_argument("--compute-dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--remat", action="store_true", help="Rematerialize activations (memory for FLOPs)")
    parser.add_argument("--cnn-scan-chunks", type=int, default=0,
                        help="Sequentialize the CNN over N chunks to bound activation memory (needed for 2x/3x at T=128 on 16GB chips)")
    parser.add_argument("--fsdp", type=int, default=1,
                        help="ZeRO-3 axis size: shard params + Adam moments over this many chips (batch shards over dp*fsdp)")
    parser.add_argument("--sp", type=int, default=1, help="Sequence-parallel axis size: shard the chunk time axis")
    parser.add_argument("--tp", type=int, default=1, help="Tensor-parallel axis size: Megatron-style kernel sharding")
    parser.add_argument("--qat-dense", action="store_true",
                        help="Quantization-aware training: forward against int8-rounded dense weights "
                             "(straight-through gradients) so int8 serving loses no fidelity")
    parser.add_argument("--labels-dir", type=str, default=None,
                        help="Train on IDM pseudo-labels: directory of <video_id>.jsonl files "
                             "(tools/label_videos.py output) instead of side-by-side recorder jsonl — "
                             "the VPT recipe's web-video BC stage")

    args = parser.parse_args()
    behavioural_cloning_train(
        args.data_dir, args.in_model, args.in_weights, args.out_weights,
        batch_size=args.batch_size, chunk_len=args.chunk_len, epochs=args.epochs,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
        resume=args.resume, compute_dtype=args.compute_dtype, remat=args.remat,
        cnn_scan_chunks=args.cnn_scan_chunks, fsdp=args.fsdp, sp=args.sp, tp=args.tp,
        qat_dense=args.qat_dense, labels_dir=args.labels_dir,
    )
