"""Train an inverse-dynamics model on contractor recordings.

The missing stage of the public VPT pipeline: the reference ships only a
PRE-trained IDM (README.md:81-99) and the code to label videos with it —
never the code that trains one.  This CLI closes the loop:

    # 1. train the IDM on a small labeled corpus (this script)
    python inverse_dynamics_train.py --data-dir contractor/ \
        --in-model 4x_idm.model --out-weights my_idm.weights

    # 2. pseudo-label a large unlabeled corpus with it
    python tools/label_videos.py --model 4x_idm.model --weights my_idm.weights \
        --video-dir web_videos/ --out-dir labels/ --stride 64

    # 3. behavioural-clone on the pseudo-labels, then RL fine-tune
    python behavioural_cloning.py ...  &&  python rl_fine_tune.py ...

Takes the same dataset layout as behavioural_cloning.py (mp4 + jsonl pairs);
``--in-weights`` warm-starts from existing IDM weights (e.g. the published
4x), otherwise training is from scratch.  ``--val-dir`` reports held-out NLL
and argmax exact-match rates after training.
"""

from argparse import ArgumentParser

from vpt_tpu.training.idm import IDMHyperparams, IDMTrainer


def inverse_dynamics_train(data_dir, in_model, out_weights, in_weights=None,
                           batch_size=8, window=128, epochs=2,
                           checkpoint_dir=None, checkpoint_every=0, resume=False,
                           compute_dtype="float32", remat=False, cnn_scan_chunks=0,
                           fsdp=1, sp=1, tp=1, qat_dense=False, val_dir=None):
    from vpt_tpu.parallel.mesh import maybe_initialize_distributed

    # multi-host pod launch: see behavioural_cloning.py — must precede any
    # XLA backend touch so the default mesh spans all hosts
    maybe_initialize_distributed()
    hp = IDMHyperparams(
        batch_size=batch_size,
        window=window,
        epochs=epochs,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    mesh = None
    if fsdp > 1 or sp > 1 or tp > 1:
        from vpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_fsdp=fsdp, n_sp=sp, n_tp=tp)
    trainer = IDMTrainer.from_files(in_model, in_weights, hp=hp,
                                    compute_dtype=compute_dtype, remat=remat,
                                    cnn_scan_chunks=cnn_scan_chunks, mesh=mesh,
                                    qat_dense=qat_dense)
    steps = trainer.train(
        data_dir,
        out_weights,
        resume_dir=checkpoint_dir if resume else None,
    )
    print(f"Finished: {steps} optimizer steps → {out_weights}")
    if val_dir:
        print("held-out:", trainer.evaluate(val_dir))


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--data-dir", type=str, required=True, help="Directory of labeled recordings (mp4 + jsonl) to train on")
    parser.add_argument("--in-model", required=True, type=str, help="Path to the IDM '.model' file (architecture kwargs)")
    parser.add_argument("--in-weights", type=str, default=None, help="Optional '.weights' to warm-start from (omit to train from scratch)")
    parser.add_argument("--out-weights", required=True, type=str, help="Path where trained IDM weights will be saved")
    parser.add_argument("--val-dir", type=str, default=None, help="Held-out recordings: report NLL + exact-match after training")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--window", type=int, default=128, help="Frames per training window (the published IDM's geometry)")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--checkpoint-dir", type=str, default=None, help="Mid-run checkpoint directory")
    parser.add_argument("--checkpoint-every", type=int, default=0, help="Steps between mid-run checkpoints")
    parser.add_argument("--resume", action="store_true", help="Resume from the latest checkpoint in --checkpoint-dir")
    parser.add_argument("--compute-dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--remat", action="store_true", help="Rematerialize activations (memory for FLOPs)")
    parser.add_argument("--cnn-scan-chunks", type=int, default=0,
                        help="Sequentialize the CNN over N chunks to bound activation memory")
    parser.add_argument("--fsdp", type=int, default=1,
                        help="ZeRO-3 axis size: shard params + Adam moments over this many chips")
    parser.add_argument("--sp", type=int, default=1, help="Sequence-parallel axis size: shard the window time axis")
    parser.add_argument("--tp", type=int, default=1, help="Tensor-parallel axis size: Megatron-style kernel sharding")
    parser.add_argument("--qat-dense", action="store_true",
                        help="Quantization-aware training against int8-rounded dense weights")

    args = parser.parse_args()
    inverse_dynamics_train(
        args.data_dir, args.in_model, args.out_weights, in_weights=args.in_weights,
        batch_size=args.batch_size, window=args.window, epochs=args.epochs,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
        resume=args.resume, compute_dtype=args.compute_dtype, remat=args.remat,
        cnn_scan_chunks=args.cnn_scan_chunks, fsdp=args.fsdp, sp=args.sp, tp=args.tp,
        qat_dense=args.qat_dense, val_dir=args.val_dir,
    )
