"""Command-line interface: learn / play / train / replay.

Rebuilds the reference's clap CLI (reference src/main.rs:15-79) with the
same four subcommands and global flags:

* ``--config`` / ``-c``: flat TOML config path (main.rs:19-21)
* ``--game`` / ``-g``: backgammon | tictactoe (main.rs:23-25)
* the reference's ``--n-cpus`` (main.rs:27-29, rayon pool sizing) becomes
  the TPU topology flags ``--mesh-data`` / ``--mesh-model`` (SURVEY.md
  section 2 row 22) plus the multi-host launch flags ``--coordinator`` /
  ``--num-processes`` / ``--process-id``: run the SAME command on every
  host of a pod and the learn loop distributes itself (jax.distributed;
  the reference is strictly single-process, src/lib.rs:22-30).

Usage:  python -m die_e_tpu.cli.main -g backgammon learn
Pod:    python -m die_e_tpu.cli.main --coordinator host0:1234 \
            --num-processes 4 --process-id $I -g backgammon learn
"""

from __future__ import annotations

import argparse
import sys

import jax


def _get_env(name: str):
    if name == "backgammon":
        from die_e_tpu.envs import backgammon as g
    elif name == "tictactoe":
        from die_e_tpu.envs import tictactoe as g
    else:
        raise SystemExit(f"unknown game {name!r} (backgammon|tictactoe)")
    return g


def _agent(kind: str, model_path, env, rng):
    from die_e_tpu.arena.versus import Agent, Player
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train import checkpoint as ckpt

    kind = kind.lower()
    if kind in ("random", "mcts"):
        return Player(Agent(kind))
    if kind == "model":
        net = make_net(env.SPEC)
        template = init_params(net, rng)
        if model_path:
            variables = ckpt.restore_variables(model_path, template)
        else:
            best = ckpt.best_model_path(env.SPEC.name)
            if not best.exists():
                raise SystemExit(
                    f"model agent requested but no model at {best}; "
                    "pass --model-path"
                )
            variables = ckpt.restore_variables(best, template)
        return Player(Agent.MODEL, variables)
    raise SystemExit(f"unknown agent kind {kind!r} (random|mcts|model)")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="die-e-tpu",
        description="TPU-native AlphaZero for Backgammon (and TicTacToe)",
    )
    p.add_argument("-c", "--config", default=None, help="TOML config path")
    p.add_argument(
        "-g", "--game", default="backgammon",
        choices=["backgammon", "tictactoe"],
    )
    p.add_argument("--mesh-data", type=int, default=None,
                   help="devices on the data axis (-1 = all)")
    p.add_argument("--mesh-model", type=int, default=None,
                   help="devices on the model axis")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port "
                        "(jax.distributed); also via JAX_COORDINATOR_ADDRESS")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's process index")
    p.add_argument("--platform", default=None,
                   help="force the JAX platform (cpu|tpu); overrides any "
                        "sitecustomize-registered PJRT plugin, unlike the "
                        "JAX_PLATFORMS env var")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics-jsonl", default=None,
                   help="append structured metric events to this JSONL file "
                        "(the learning-curve record)")
    sub = p.add_subparsers(dest="command", required=True)

    # Learn (main.rs:34-38)
    pl = sub.add_parser("learn", help="run the self-play learn loop")
    pl.add_argument("-m", "--model-path", default=None)
    pl.add_argument("--resume", action="store_true",
                    help="resume from the latest full train state "
                         "(incl. optimizer)")

    # Play (main.rs:40-60)
    pp = sub.add_parser("play", help="arena match between two agents")
    pp.add_argument("-1", "--agent-one", required=True,
                    help="random|mcts|model")
    pp.add_argument("-2", "--agent-two", required=True,
                    help="random|mcts|model")
    pp.add_argument("--model1-path", default=None)
    pp.add_argument("--model2-path", default=None)
    pp.add_argument("-o", "--output-path", default=None,
                    help="directory for JSON game records")
    pp.add_argument("--num-games", type=int, default=None)

    # Train (main.rs:62-74)
    pt = sub.add_parser("train", help="offline training from saved data")
    pt.add_argument("-m", "--model-path", default=None)
    pt.add_argument("-o", "--out-path", default=None)
    pt.add_argument("-r", "--run-id", default=None)
    pt.add_argument("-l", "--learn", dest="learn_idx", default=None)
    pt.add_argument("-s", "--self-play", dest="sp_idx", default=None)

    # Replay (main.rs:76-79)
    pr = sub.add_parser("replay", help="replay a recorded game")
    pr.add_argument("game_path")
    pr.add_argument("--no-wait", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # platform + cluster join must precede the first backend use
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from die_e_tpu.parallel.multihost import initialize_multihost

    initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    from die_e_tpu.core.config import load_config
    from die_e_tpu.core.metrics import Metrics

    # multi-process: every host logs, but to its own file — concurrent
    # appends from several processes would interleave mid-line
    if args.metrics_jsonl and jax.process_index() != 0:
        args.metrics_jsonl = f"{args.metrics_jsonl}.p{jax.process_index()}"

    config = load_config(args.config)
    if args.mesh_data is not None or args.mesh_model is not None:
        # override each field independently so a lone --mesh-data does not
        # clobber a mesh_model set in the TOML (and vice versa)
        import dataclasses as _dc

        mesh = config.mesh
        if args.mesh_data is not None:
            mesh = _dc.replace(mesh, data=args.mesh_data)
        if args.mesh_model is not None:
            mesh = _dc.replace(mesh, model=args.mesh_model)
        config = _dc.replace(config, mesh=mesh)
    env_mod = _get_env(args.game)
    env = env_mod.ENV
    metrics = Metrics(jsonl_path=args.metrics_jsonl)
    rng = jax.random.PRNGKey(args.seed)

    if args.command == "learn":
        from die_e_tpu.train.learn import learn

        learn(env, config, seed=args.seed, model_path=args.model_path,
              metrics=metrics, resume=args.resume)

    elif args.command == "play":
        from die_e_tpu.arena.versus import play
        from die_e_tpu.arena.records import save_game
        from die_e_tpu.nets.resnet import make_net
        from die_e_tpu.train.learner import net_eval_fn

        from die_e_tpu.core.mesh import compute_dtype

        rng, r1, r2, r_play = jax.random.split(rng, 4)
        p1 = _agent(args.agent_one, args.model1_path, env_mod, r1)
        p2 = _agent(args.agent_two, args.model2_path, env_mod, r2)
        eval_fn = net_eval_fn(make_net(env.spec, dtype=compute_dtype()))
        result = play(
            env, eval_fn, p1, p2, r_play, config.mcts,
            temperature=config.alphazero.temperature,
            num_games=args.num_games or config.arena.num_games,
            round_limit=config.arena.round_limit,
            record=args.output_path is not None,
            metrics=metrics,
        )
        print(result)
        if args.output_path:
            for rec in result.games:
                save_game(rec, args.output_path)
            print(f"saved {len(result.games)} game records to "
                  f"{args.output_path}")

    elif args.command == "train":
        from die_e_tpu.train.learn import train_offline

        # resolve data dir ./data/{game}[/run-{id}[/lrn-{i}[/sp-{j}]]]
        # (main.rs:176-186)
        data_path = f"./data/{env.spec.name}"
        if args.run_id:
            data_path += f"/run-{args.run_id}"
            if args.learn_idx is not None:
                data_path += f"/lrn-{args.learn_idx}"
                if args.sp_idx is not None:
                    data_path += f"/sp-{args.sp_idx}"
        train_offline(
            env, config, data_path, seed=args.seed,
            model_path=args.model_path, out_path=args.out_path,
            metrics=metrics,
        )

    elif args.command == "replay":
        from die_e_tpu.arena.records import replay_game

        replay_game(env, args.game_path, env_mod.pretty_str,
                    wait_user_input=not args.no_wait)
    return 0


if __name__ == "__main__":
    sys.exit(main())
