"""Behavioral cloning from demonstration pickles.

Reference surface: ``python -m run --algo bc --demo_path demos/Sawyer_...``
(``README.md:95-101``); demos are the pickles written by ``DemoRecorder``
(``util/demo_recorder.py:58-87``). The training itself lived in the absent
``method`` package — here it is a jitted full-batch/minibatch MSE+NLL fit
of the gaussian policy, one XLA program per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import networks as N


@dataclass(frozen=True)
class BCConfig:
    lr: float = 1e-3
    batch_size: int = 256
    epochs: int = 100
    hidden: tuple = (256, 256)
    val_frac: float = 0.1


class BCState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array


def demos_to_dataset(demos: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Stack (obs, action) pairs from DemoRecorder-schema pickles
    (``len(obs) == len(actions)+1``, ``scripts/examine_demos.py:8-21``).
    Dict observations are flattened with the sorted-key convention."""
    xs, ys = [], []
    for d in demos:
        obs, acts = d["obs"], d["actions"]
        for ob, ac in zip(obs[: len(acts)], acts):
            if isinstance(ob, dict):
                ob = np.concatenate(
                    [np.asarray(ob[k], np.float32).ravel() for k in sorted(ob)]
                )
            xs.append(np.asarray(ob, np.float32).ravel())
            ys.append(np.asarray(ac, np.float32).ravel())
    return np.stack(xs), np.stack(ys)


def make_bc(obs_d: int, act_d: int, cfg: BCConfig = BCConfig()):
    """Returns ``(init, fit_epoch, predict)``."""
    tx = optax.adam(cfg.lr)

    def init(key) -> BCState:
        k1, k2 = jax.random.split(key)
        params = N.init_policy(k1, obs_d, act_d, cfg.hidden)
        return BCState(params, tx.init(params), k2)

    def loss_fn(params, x, y):
        mean, log_std = N.policy_dist(params, x)
        nll = -jnp.mean(N.gaussian_logp(y, mean, log_std))
        mse = jnp.mean((mean - y) ** 2)
        return nll + mse, mse

    @jax.jit
    def fit_epoch(state: BCState, x, y):
        n = x.shape[0]
        key, k_perm = jax.random.split(state.key)
        nb = max(n // cfg.batch_size, 1)
        perm = jax.random.permutation(k_perm, n)[: nb * cfg.batch_size]
        idxs = perm.reshape(nb, -1)

        def step(carry, idx):
            params, opt_state = carry
            (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x[idx], y[idx]
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, mse)

        (params, opt_state), (losses, mses) = jax.lax.scan(
            step, (state.params, state.opt_state), idxs
        )
        return BCState(params, opt_state, key), {
            "loss": losses.mean(),
            "mse": mses.mean(),
        }

    @jax.jit
    def predict(params, x):
        mean, _ = N.policy_dist(params, x)
        return mean

    return init, fit_epoch, predict
