"""die-e-tpu: a TPU-native AlphaZero framework with the capabilities of
alibasaran/die-e (reference: /root/reference, Rust + tch/libtorch).

This is a from-scratch JAX/XLA/pjit design, not a port:

* Game environments are vectorized pure functions over batched arrays
  (thousands of games stepped in lockstep under ``jit``), replacing the
  reference's per-game Rust structs (reference src/base.rs:8-51).
* Legal-move enumeration is a fixed-shape masked kernel over the full
  1352-action space, replacing the reference's recursive action trees
  (reference src/backgammon/backgammon_logic.rs:544-774).
* MCTS is an mctx-style array tree fully on device, replacing the
  host-side ``NodeStore`` tree walk with device round-trips per
  iteration (reference src/mcts/alpha_mcts.rs:91-202).
* The policy/value ResNet is Flax with pjit shardings over a
  (data, model) mesh; training uses optax + Orbax checkpoints
  (reference src/alphazero/nnet.rs, alphazero.rs).
"""

__version__ = "0.1.0"
