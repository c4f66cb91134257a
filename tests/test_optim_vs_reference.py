"""Optimizer + LR-scheduler parity against live torch.

The reference trains with ``AdamW + ReduceLROnPlateau``
(``src/training/utils_train.py:20-36``, both with torch defaults). These
tests drive the actual torch implementations next to ours:

* AdamW: identical parameter/gradient streams through ``torch.optim.AdamW``
  and ``train/optim.py::build_optimizer`` must produce the same parameter
  trajectory (decoupled weight decay, bias correction, eps placement all
  pinned);
* ReduceLROnPlateau: a synthetic val-loss sequence must produce the same LR
  trajectory (rel-threshold improvement test, patience counting, factor
  application) through ``torch.optim.lr_scheduler.ReduceLROnPlateau`` and
  ``plateau_update``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_adamw_trajectory_matches_torch():
    import jax.numpy as jnp

    from custom_yolo_tpu.config import TrainingConfig
    from custom_yolo_tpu.train.optim import build_optimizer

    rng = np.random.RandomState(0)
    w0 = rng.randn(13, 7).astype(np.float32)
    grads = [rng.randn(13, 7).astype(np.float32) * 0.3 for _ in range(25)]
    lr, wd = 2e-3, 0.05

    # torch side (grad clip matched to ours)
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([p], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([p], 1.0)
        opt.step()
    torch_w = p.detach().numpy()

    # ours
    cfg = TrainingConfig(optimizer="adamw", learning_rate=lr,
                         weight_decay=wd, grad_clip=1.0)
    tx = build_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    import optax
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    ours_w = np.asarray(params["w"])

    np.testing.assert_allclose(ours_w, torch_w, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("patience,factor", [(2, 0.5), (0, 0.1)])
def test_plateau_trajectory_matches_torch(patience, factor):
    from custom_yolo_tpu.train.optim import plateau_init, plateau_update

    losses = [5.0, 4.0, 4.0, 4.0, 4.0, 3.0, 3.0001, 2.9999, 2.9, 2.9, 2.9,
              2.9, 2.9, 10.0, 1.0, 1.0, 1.0, 1.0]

    base_lr = 1.0
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=patience, factor=factor)

    state = plateau_init()
    torch_lrs, our_scales = [], []
    for loss in losses:
        sched.step(loss)
        state = plateau_update(state, loss, patience=patience,
                               factor=factor, base_lr=base_lr)
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_scales.append(float(state.scale))

    np.testing.assert_allclose(our_scales, torch_lrs, rtol=1e-6,
                               err_msg=f"{list(zip(losses, our_scales, torch_lrs))}")
