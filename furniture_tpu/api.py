"""Host-facing gym-style API.

Mirrors the reference's registration surface (``env/base.py:15-94`` EnvMeta
registry + ``make_env``/``make_vec_env``; gym IDs at ``env/__init__.py:19-114``)
while the actual computation stays in pure jitted device functions.

``FurnitureEnvWrapper`` is the single-env convenience layer (numpy in/out,
auto state threading). ``VecEnv`` replaces the reference's process-per-worker
``SubprocVecEnv`` (``util/subproc_vec_env.py:51``) with a vmapped batch on
one device — thousands of envs per chip instead of one per process.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .config import EnvConfig
from .envs.cursor import CursorEnv
from .models import furniture_name2id, furniture_names

REGISTERED_ENVS: dict[str, Callable] = {}


def register_env(name: str, factory: Callable) -> None:
    REGISTERED_ENVS[name] = factory


def get_env(name: str) -> Callable:
    if name not in REGISTERED_ENVS:
        raise ValueError(
            f"unknown env {name!r}; registered: {sorted(REGISTERED_ENVS)}"
        )
    return REGISTERED_ENVS[name]


class Space:
    """Minimal gym.spaces.Box/Dict stand-in (keeps zero hard deps)."""

    def __init__(self, shape=None, low=-np.inf, high=np.inf, spaces=None):
        self.shape = shape
        self.low = low
        self.high = high
        self.spaces = spaces

    def sample(self, rng: np.random.RandomState | None = None):
        rng = rng or np.random
        if self.spaces is not None:
            return {k: v.sample(rng) for k, v in self.spaces.items()}
        lo = -1.0 if not np.isfinite(self.low) else self.low
        hi = 1.0 if not np.isfinite(self.high) else self.high
        return rng.uniform(lo, hi, size=self.shape).astype(np.float32)


class FurnitureEnvWrapper:
    """Single-env, host-friendly wrapper: ``reset()``/``step(action)`` with
    numpy I/O, like the reference's ``FurnitureEnv`` public surface
    (``env/furniture.py:318,364``)."""

    def __init__(self, env_factory, config: EnvConfig, seed: int = 0):
        self.config = config
        self.env = env_factory(config)
        self._reset_fn = jax.jit(self.env.reset)
        self._step_fn = jax.jit(self.env.step)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._render_fn = None

    def _renderer(self):
        """Lazily-built jitted state->(rgb,depth,seg) camera
        (reference render path ``env/furniture.py:586-668``)."""
        if self._render_fn is None:
            from .render import frontview, make_render_fn

            cam = frontview(self.config.screen_width, self.config.screen_height)
            self._render_fn = jax.jit(make_render_fn(self.env, cam))
        return self._render_fn

    def _camera_obs(self, obs: dict) -> dict:
        cfg = self.config
        if not (cfg.camera_ob or cfg.depth_ob or cfg.segmentation_ob):
            return obs
        rgb, depth, seg = self._renderer()(self._state)
        if cfg.camera_ob:
            obs["camera_ob"] = np.asarray(rgb)
        if cfg.depth_ob:
            obs["depth_ob"] = np.asarray(depth)
        if cfg.segmentation_ob:
            obs["segmentation_ob"] = np.asarray(seg)
        return obs

    def render(self, mode: str = "rgb_array"):
        """On-device raycast render of the current state
        (``env/furniture.py:586-631`` render modes)."""
        assert self._state is not None, "call reset() first"
        rgb, depth, seg = self._renderer()(self._state)
        if mode in ("rgb_array", "rgbarray", "human"):
            return np.asarray(rgb)
        if mode == "depth_array":
            return np.asarray(depth)
        if mode in ("segmentation", "seg_array"):
            return np.asarray(seg)
        raise ValueError(f"unknown render mode {mode!r}")

    # -- spaces ------------------------------------------------------------

    @property
    def action_space(self) -> Space:
        return Space(shape=(self.env.dof,), low=-1.0, high=1.0)

    @property
    def observation_space(self) -> Space:
        spaces = {}
        if self.config.object_ob:
            spaces["object_ob"] = Space(shape=(self.env.model.n_parts * 7,))
        if self.config.robot_ob:
            spaces["robot_ob"] = Space(shape=(8,))
        if self.config.subtask_ob:
            spaces["subtask_ob"] = Space(shape=(2,))
        h, w = self.config.screen_height, self.config.screen_width
        if self.config.camera_ob:
            spaces["camera_ob"] = Space(shape=(h, w, 3), low=0.0, high=1.0)
        if self.config.depth_ob:
            spaces["depth_ob"] = Space(shape=(h, w), low=0.0)
        if self.config.segmentation_ob:
            spaces["segmentation_ob"] = Space(shape=(h, w))
        return Space(spaces=spaces)

    # -- episode API -------------------------------------------------------

    def reset(self, seed: int | None = None) -> dict:
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        self._state = self._reset_fn(sub)
        obs = {k: np.asarray(v) for k, v in self.env.observe(self._state).items()}
        return self._camera_obs(obs)

    def step(self, action):
        assert self._state is not None, "call reset() first"
        self._state, obs, rew, done, info = self._step_fn(
            self._state, jnp.asarray(action, jnp.float32)
        )
        obs = {k: np.asarray(v) for k, v in obs.items()}
        info = {k: np.asarray(v) for k, v in info.items()}
        return self._camera_obs(obs), float(rew), bool(done), info

    # env-state checkpointing (reference get/set_env_state,
    # env/furniture.py:1781-1803); the state pytree is the checkpoint
    def get_env_state(self):
        return self._state

    def set_env_state(self, state):
        self._state = state

    def close(self):
        pass


class VecEnv:
    """Vmapped env batch with auto-reset, replacing SubprocVecEnv.

    ``step`` keeps everything on device; done lanes are re-reset from fresh
    RNG (the reference auto-resets inside workers,
    ``util/subproc_vec_env.py:17-20``).
    """

    def __init__(self, env_factory, config: EnvConfig, num_envs: int, seed: int = 0):
        self.config = config
        self.env = env_factory(config)
        self.num_envs = num_envs
        self._key = jax.random.PRNGKey(seed)

        reset1 = self.env.reset
        step1 = self.env.step
        # batched fast paths (megakernel physics) where the env provides them
        if getattr(self.env, "has_batch_api", False):
            reset_b = self.env.reset_batch
            step_b = self.env.step_batch
        else:
            reset_b = lambda keys: jax.vmap(reset1)(keys)
            step_b = lambda state, actions: jax.vmap(step1)(state, actions)

        @jax.jit
        def reset_all(key):
            return reset_b(jax.random.split(key, num_envs))

        @jax.jit
        def step_all(state, actions, key):
            state, obs, rew, done, info = step_b(state, actions)

            # lazy auto-reset: episodes are 2000 steps (config/furniture.py:
            # 164-168), so dones are rare — only pay the reset (100 settle
            # substeps/lane) on steps where some lane actually finished
            def do_reset(st):
                fresh = reset_b(jax.random.split(key, num_envs))
                return jax.tree.map(
                    lambda new, old: jnp.where(
                        done.reshape((num_envs,) + (1,) * (old.ndim - 1)),
                        new,
                        old,
                    ),
                    fresh,
                    st,
                )

            state = jax.lax.cond(jnp.any(done), do_reset, lambda s: s, state)
            return state, obs, rew, done, info

        self._reset_all = reset_all
        self._step_all = step_all
        self._state = None

    def reset(self) -> dict:
        self._key, sub = jax.random.split(self._key)
        self._state = self._reset_all(sub)
        return self.env.observe(self._state) if hasattr(self.env, "observe") else {}

    def step(self, actions):
        self._key, sub = jax.random.split(self._key)
        self._state, obs, rew, done, info = self._step_all(
            self._state, jnp.asarray(actions, jnp.float32), sub
        )
        return obs, rew, done, info

    @property
    def state(self):
        return self._state


def _resolve_config(kwargs) -> EnvConfig:
    config = kwargs.pop("config", None) or EnvConfig()
    if "furniture_id" in kwargs:
        kwargs["furniture_name"] = furniture_names[kwargs.pop("furniture_id")]
    valid = {f.name for f in dataclasses.fields(EnvConfig)}
    cfg_kwargs = {k: v for k, v in kwargs.items() if k in valid}
    unknown = set(kwargs) - valid
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return config.replace(**cfg_kwargs)


def make_env(name: str, seed: int = 0, **kwargs) -> FurnitureEnvWrapper:
    factory = get_env(name)
    config = _resolve_config(kwargs)
    return FurnitureEnvWrapper(factory, config, seed=seed)


def make_vec_env(name: str, num_envs: int, seed: int = 0, **kwargs) -> VecEnv:
    factory = get_env(name)
    config = _resolve_config(kwargs)
    return VecEnv(factory, config, num_envs, seed=seed)


# -- registry population (gym-id parity with env/__init__.py:19-114) --------

def _cursor_factory(config: EnvConfig) -> CursorEnv:
    return CursorEnv(config.replace(agent_type="Cursor"))


register_env("FurnitureCursorEnv", _cursor_factory)
register_env("IKEACursor-v0", _cursor_factory)


def _register_arm_envs():
    from .envs.arm import make_arm_env

    for agent in ("Sawyer", "Panda", "Jaco", "Fetch", "Baxter"):
        factory = make_arm_env(agent)
        register_env(f"Furniture{agent}Env", factory)
        register_env(f"IKEA{agent}-v0", factory)

    def _dense_factory(config: EnvConfig):
        from .envs.sawyer_dense import FurnitureSawyerDenseRewardEnv

        return FurnitureSawyerDenseRewardEnv(config.replace(agent_type="Sawyer"))

    def _gen_factory(config: EnvConfig):
        from .envs.sawyer_gen import FurnitureSawyerGenEnv

        return FurnitureSawyerGenEnv(config.replace(agent_type="Sawyer"))

    # gym-id parity: env/__init__.py:103-114 + furniture_sawyer_gen.py:738
    register_env("IKEASawyerDense-v0", _dense_factory)
    register_env("furniture-sawyer-densereward-v0", _dense_factory)
    register_env("FurnitureSawyerDenseRewardEnv", _dense_factory)
    register_env("IKEASawyerGen-v0", _gen_factory)
    register_env("FurnitureSawyerGenEnv", _gen_factory)

    def _toytable_factory(config: EnvConfig):
        from .envs.baxter_toytable import FurnitureBaxterToyTableEnv

        return FurnitureBaxterToyTableEnv(config)

    register_env("FurnitureBaxterToyTableEnv", _toytable_factory)


_register_arm_envs()
