"""End-to-end CLI test: train -> eval -> checkpoint -> --test_only --tta.

Exercises the full orchestration path of vdetr_tpu.main (reference
main.py:237-480) at a tiny config on the 8-device CPU mesh: the train
loop, the pad_last eval pass (every val scan scored), best-checkpoint
tracking, final_eval artifacts, and TTA reachable from the CLI
(reference README.md:93 claims TTA but never shipped it).
"""

import os

import numpy as np


from vdetr_tpu.main import main

TINY = [
    "--dataset_name", "synthetic",
    "--voxel_capacity", "1024", "--min_stage_capacity", "128",
    "--preenc_npoints", "64", "--nqueries", "16",
    "--dec_nlayers", "2", "--dec_dim", "32", "--dec_ffn_dim", "32",
    "--rpe_dim", "8", "--inplanes", "8", "--enc_dim", "32",
    "--fps_impl", "jax", "--num_points", "512", "--repeat_num", "2",
    "--mlp_dropout", "0", "--dec_dropout", "0",
]


def test_main_train_eval_tta(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    overall = main(TINY + [
        "--max_epoch", "1", "--checkpoint_dir", ckpt_dir,
        "--eval_every_epoch", "10",
    ])
    assert 0.25 in overall and np.isfinite(overall[0.25]["mAP"])
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint"))
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint_best"))
    assert os.path.isfile(os.path.join(ckpt_dir, "final_eval.txt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "final_eval.pkl"))

    # --tta from the CLI (VERDICT round-1 item 5)
    overall_tta = main(TINY + [
        "--test_only", "1", "--tta", "1",
        "--test_ckpt", os.path.join(ckpt_dir, "checkpoint_best"),
    ])
    assert 0.25 in overall_tta and np.isfinite(overall_tta[0.25]["mAP"])
