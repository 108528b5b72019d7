"""A/B convergence gate for the auction matcher (VERDICT round-1 weak 5).

The auction LAP is the training default (eps-optimal, fast on TPU) while
the reference uses exact scipy assignment (criterion.py:215). The
adversarial unit tests bound the per-matrix cost gap; this test bounds
the thing that matters — training trajectories: overfitting one batch
with matcher_impl=auction vs =jv (exact Jonker-Volgenant) must produce
equivalent convergence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
from vdetr_tpu.models import build_model
from vdetr_tpu.parallel import make_mesh
from vdetr_tpu.train.engine import Trainer


def _run(matcher_impl: str, steps: int = 18):
    cfg = VDETRConfig(
        voxel_capacity=2048, min_stage_capacity=128,
        grid_extent=(128, 128, 64), preenc_npoints=128, nqueries=32,
        dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, rpe_dim=16, inplanes=8,
        enc_dim=32, fps_impl="jax", num_points=1024, repeat_num=2,
        max_epoch=10, base_lr=1e-3, warm_lr_epochs=0, mlp_dropout=0.0,
        dec_dropout=0.0, matcher_impl=matcher_impl,
    )
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds, axis_name="data")
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=1, max_objects=4)
    batch = {k: jnp.asarray(v) for k, v in collate([data[0]]).items()}
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(steps):
        rng, r = jax.random.split(rng)
        state, loss, _ = trainer.train_step(state, batch, r)
        losses.append(float(loss))
    return np.asarray(losses)


@pytest.mark.slow
def test_auction_matches_exact_convergence():
    la = _run("auction")
    lj = _run("jv")
    assert np.all(np.isfinite(la)) and np.all(np.isfinite(lj))
    # both overfit the single batch
    assert la[-1] < la[0] * 0.85
    assert lj[-1] < lj[0] * 0.85
    # trajectories equivalent (identical init + data + rng; the only
    # difference is the assignment solver): sub-percent divergence on
    # average, bounded compounding late in the overfit (measured max
    # ~6% at step 17)
    rel = np.abs(la[2:] - lj[2:]) / np.maximum(np.abs(lj[2:]), 1e-6)
    assert rel.mean() < 0.04, (la.tolist(), lj.tolist())
    assert rel.max() < 0.15, (la.tolist(), lj.tolist())
