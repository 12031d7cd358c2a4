"""AlphaZero-style policy/value ResNet in Flax.

Topology is identical to the reference's tch net (reference
src/alphazero/nnet.rs:56-107):

* init block: conv 3x3 pad 1 (C_in -> F) -> BatchNorm -> ReLU    (nnet.rs:64-67)
* N res blocks: conv-BN-ReLU-conv-BN-add-ReLU                    (nnet.rs:17-45)
* policy head: conv 3x3 (F -> 32) -> BN -> ReLU -> flatten ->
  dense(32*conv_out -> A)                                        (nnet.rs:75-85)
* value head: conv 3x3 (F -> 3) -> BN -> ReLU -> flatten ->
  dense(3*conv_out -> 1) -> tanh                                 (nnet.rs:87-98)

Per-game hyperparameters (F = n_filters, N = n_res_blocks, A = num_actions)
come from the game's :class:`~die_e_tpu.envs.base.GameSpec`, mirroring the
trait consts (reference src/base.rs:17-24).

TPU-first choices that differ from the reference implementation (not
topology): NHWC layout (TPU conv layout; the reference is NCHW), optional
bfloat16 compute with float32 params and float32 BatchNorm statistics, and
three entry points matching the reference's forward_t / forward_train /
forward_policy (nnet.rs:120-155) expressed as ``method`` selectors.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from die_e_tpu.envs.base import GameSpec


class ResBlock(nn.Module):
    """conv-BN-ReLU-conv-BN-add-ReLU (reference nnet.rs:17-45)."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        return nn.relu(y + x)


class PolicyValueNet(nn.Module):
    """Returns (policy_logits [B, A], value [B, 1])."""

    spec: GameSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = self.spec.n_filters
        x = x.astype(self.dtype)
        # init block (nnet.rs:64-67)
        x = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        # res tower (nnet.rs:69-73)
        for _ in range(self.spec.n_res_blocks):
            x = ResBlock(f, dtype=self.dtype)(x, train)
        # policy head (nnet.rs:75-85)
        p = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype)(x)
        p = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(p)
        p = nn.relu(p).reshape(p.shape[0], -1)
        p = nn.Dense(self.spec.num_actions, dtype=self.dtype)(p)
        # value head (nnet.rs:87-98)
        v = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(v)
        v = nn.relu(v).reshape(v.shape[0], -1)
        v = nn.Dense(1, dtype=self.dtype)(v)
        v = jnp.tanh(v)
        return p.astype(jnp.float32), v.astype(jnp.float32)


def make_net(spec: GameSpec, dtype=jnp.float32) -> PolicyValueNet:
    return PolicyValueNet(spec=spec, dtype=dtype)


def init_params(net: PolicyValueNet, rng) -> dict:
    """Init {params, batch_stats} variables for a net."""
    h, w, c = net.spec.obs_shape
    dummy = jnp.zeros((1, h, w, c), jnp.float32)
    return net.init(rng, dummy, train=False)


def forward(net: PolicyValueNet, variables, obs, softmax_policy: bool = True):
    """Inference forward pass (reference forward_t, nnet.rs:120-133):
    softmaxed policy + tanh value, BatchNorm in eval mode."""
    logits, value = net.apply(variables, obs, train=False)
    if softmax_policy:
        return jax.nn.softmax(logits, axis=-1), value
    return logits, value


def forward_train(net: PolicyValueNet, variables, obs):
    """Training forward (reference forward_train, nnet.rs:137-148): raw policy
    logits for the CE loss, BatchNorm in train mode; returns updated
    batch_stats as aux."""
    (logits, value), mutated = net.apply(
        variables, obs, train=True, mutable=["batch_stats"]
    )
    return (logits, value), mutated


def forward_policy(net: PolicyValueNet, variables, obs):
    """Policy-only forward (reference forward_policy, nnet.rs:150-155)."""
    logits, _ = net.apply(variables, obs, train=False)
    return jax.nn.softmax(logits, axis=-1)
