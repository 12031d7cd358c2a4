"""Arena / versus engine and game-record tests (reference src/versus.rs)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.arena.records import (
    GameRecord,
    Turn,
    load_all_games,
    load_game,
    replay_game,
    save_game,
)
from die_e_tpu.arena.versus import Agent, Player, play
from die_e_tpu.core.config import MctsConfig
from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import init_params, make_net
from die_e_tpu.train.learner import net_eval_fn

NET = make_net(ttt.SPEC)
EVAL = net_eval_fn(NET)
MCTS_CFG = MctsConfig(iterations=8, simulate_round_limit=9)


class TestPlay:
    def test_counts_sum_and_winrate(self):
        res = play(
            ttt.ENV, EVAL, Player(Agent.RANDOM), Player(Agent.RANDOM),
            jax.random.PRNGKey(0), MCTS_CFG, num_games=16, round_limit=9,
        )
        assert res.wins_p1 + res.wins_p2 + res.draws == 16
        assert res.winrate == res.wins_p1 / 16
        assert res.n_games == 16

    def test_half_games_open_with_skipped_turn(self):
        """versus.rs:172-175: player 2 opens the second half of the batch."""
        res = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(1), MCTS_CFG, num_games=8, round_limit=9,
            record=True,
        )
        openers = [g.turns[0].player for g in res.games if g.turns]
        # p1 (mcts, side -1) opens the first half; p2 (random) the second
        assert set(openers) == {"mcts", "random"}

    def test_mcts_beats_random(self):
        res = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(2), MCTS_CFG, num_games=16, round_limit=9,
        )
        assert res.wins_p1 > res.wins_p2

    def test_model_agent_runs(self):
        variables = init_params(NET, jax.random.PRNGKey(3))
        res = play(
            ttt.ENV, EVAL, Player(Agent.MODEL, variables),
            Player(Agent.RANDOM), jax.random.PRNGKey(4), MCTS_CFG,
            num_games=8, round_limit=9,
        )
        assert res.n_games == 8

    def test_hosted_mcts_match_matches_fused(self):
        """mcts_search_chunk chains bounded device programs but threads the
        rng exactly as the fused round loop — the match is bit-identical."""
        for p1, p2 in [
            (Player(Agent.MCTS), Player(Agent.RANDOM)),  # mixed pair
            (Player(Agent.MCTS), Player(Agent.MCTS)),    # shared-draw pair
        ]:
            fused = play(
                ttt.ENV, EVAL, p1, p2, jax.random.PRNGKey(9), MCTS_CFG,
                num_games=8, round_limit=9,
            )
            hosted = play(
                ttt.ENV, EVAL, p1, p2, jax.random.PRNGKey(9), MCTS_CFG,
                num_games=8, round_limit=9, mcts_search_chunk=3,
            )
            assert (fused.wins_p1, fused.wins_p2, fused.draws) == (
                hosted.wins_p1, hosted.wins_p2, hosted.draws)

    def test_compacted_match_counts(self, monkeypatch):
        """DIE_E_ARENA_COMPACT re-packs live games at chunk boundaries;
        the match protocol (counts, winner attribution) is unchanged."""
        monkeypatch.setenv("DIE_E_ARENA_COMPACT", "1")
        monkeypatch.setenv("DIE_E_ARENA_MIN_BATCH", "2")
        res = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(2), MCTS_CFG, num_games=16, round_limit=9,
        )
        assert res.wins_p1 + res.wins_p2 + res.draws == 16
        assert res.wins_p1 > res.wins_p2  # mcts still beats random
        # hosted-mcts driver path with compaction
        res2 = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(2), MCTS_CFG, num_games=16, round_limit=9,
            mcts_search_chunk=3,
        )
        assert res2.wins_p1 + res2.wins_p2 + res2.draws == 16

    def test_match_ckpt_resume_bit_identical(self, tmp_path):
        """mcts_match_ckpt: a match killed mid-round-loop resumes from the
        last persisted round and finishes bit-identically to an
        uninterrupted match (the rng is part of the checkpoint carry)."""
        from die_e_tpu.arena import versus

        kwargs = dict(
            num_games=8, round_limit=9, mcts_search_chunk=3,
        )
        base = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(5), MCTS_CFG, **kwargs,
        )
        ckpt = str(tmp_path / "match.npz")

        # run with checkpointing but no interruption: same result, file
        # cleaned up on completion
        res = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(5), MCTS_CFG, mcts_match_ckpt=ckpt,
            **kwargs,
        )
        assert (base.wins_p1, base.wins_p2, base.draws) == (
            res.wins_p1, res.wins_p2, res.draws)
        import os
        assert not os.path.exists(ckpt)

        # interrupt after 4 rounds (ckpt_every=2 so rounds 2 and 4 are
        # persisted), then resume: bit-identical final counts
        real_apply = versus._apply_round
        calls = {"n": 0}

        def bomb(env, states, done, action):
            calls["n"] += 1
            if calls["n"] > 4:
                raise RuntimeError("tunnel wedge")
            return real_apply(env, states, done, action)

        orig_hosted = versus._play_match_mcts_hosted

        def hosted_small_ckpt(*a, **kw):
            kw["ckpt_every"] = 2
            return orig_hosted(*a, **kw)

        try:
            versus._apply_round = bomb
            versus._play_match_mcts_hosted = hosted_small_ckpt
            try:
                play(ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
                     jax.random.PRNGKey(5), MCTS_CFG, mcts_match_ckpt=ckpt,
                     **kwargs)
                raise AssertionError("bomb did not fire")
            except RuntimeError:
                pass
            assert os.path.exists(ckpt)  # round-4 checkpoint survived
        finally:
            versus._apply_round = real_apply
            versus._play_match_mcts_hosted = orig_hosted

        resumed = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(5), MCTS_CFG, mcts_match_ckpt=ckpt,
            **kwargs,
        )
        assert (base.wins_p1, base.wins_p2, base.draws) == (
            resumed.wins_p1, resumed.wins_p2, resumed.draws)
        assert not os.path.exists(ckpt)

        # a stale checkpoint from DIFFERENT match settings is ignored
        from die_e_tpu.envs.base import CompactionTracker

        versus._match_ckpt_save(
            ckpt, jax.vmap(ttt.ENV.init)(jnp.arange(8, dtype=jnp.uint32)),
            jnp.zeros(8, bool), jax.random.PRNGKey(0), 3,
            CompactionTracker(8), {"num_games": 999})
        res2 = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(5), MCTS_CFG, mcts_match_ckpt=ckpt,
            **kwargs,
        )
        assert (base.wins_p1, base.wins_p2, base.draws) == (
            res2.wins_p1, res2.wins_p2, res2.draws)

    def test_mcts_rollout_limit_match_runs(self):
        res = play(
            ttt.ENV, EVAL, Player(Agent.MCTS), Player(Agent.RANDOM),
            jax.random.PRNGKey(12), MCTS_CFG, num_games=8, round_limit=9,
            mcts_rollout_limit=3, mcts_search_chunk=4,
        )
        assert res.wins_p1 + res.wins_p2 + res.draws == 8


class TestRecords:
    def _mk_record(self):
        state = ttt.init(jnp.uint32(0))
        turns_log = [
            (np.array([-1]), np.array([4]), None),
            (np.array([1]), np.array([0]), None),
            (np.array([-1]), np.array([8]), None),
        ]
        return GameRecord.from_arrays(
            ttt.ENV, Agent.MCTS, Agent.RANDOM,
            jax.tree_util.tree_map(lambda x: x[None], state),
            turns_log, np.array([0]),
        )[0]

    def test_roundtrip(self, tmp_path):
        rec = self._mk_record()
        path = save_game(rec, tmp_path)
        loaded = load_game(path)
        assert loaded.id == rec.id
        assert [t.action for t in loaded.turns] == [4, 0, 8]
        assert loaded.player1 == "mcts" and loaded.player2 == "random"

    def test_load_all(self, tmp_path):
        for _ in range(3):
            save_game(self._mk_record(), tmp_path)
        assert len(load_all_games(tmp_path)) == 3

    def test_replay_applies_moves(self, tmp_path):
        """The reference's print_game never re-applies moves
        (versus.rs:91-93) — ours must."""
        rec = self._mk_record()
        path = save_game(rec, tmp_path)
        outputs = []
        replay_game(ttt.ENV, path, ttt.pretty_str, wait_user_input=False,
                    out=outputs.append)
        boards = [o for o in outputs if "|" in o]
        assert boards[0] != boards[-1]
        assert "x" in boards[-1] and "o" in boards[-1]

    def test_json_schema_fields(self, tmp_path):
        """versus.rs:22-52 Game/Turn schema intent."""
        path = save_game(self._mk_record(), tmp_path)
        d = json.loads(path.read_text())
        assert set(d) == {
            "id", "game", "player1", "player2", "turns", "winner",
            "initial_state",
        }
        assert set(d["turns"][0]) == {"roll", "action", "player"}


class TestDualModelSearch:
    """Model-vs-model matches run ONE batched search per round with
    per-game parameter selection by side-to-move (versus.rs:195-208
    partitions by side; lockstep shapes select instead)."""

    def test_model_vs_model_runs_and_counts(self):
        v1 = init_params(NET, jax.random.PRNGKey(10))
        v2 = init_params(NET, jax.random.PRNGKey(11))
        res = play(
            ttt.ENV, EVAL, Player(Agent.MODEL, v1), Player(Agent.MODEL, v2),
            jax.random.PRNGKey(12), MCTS_CFG, num_games=8, round_limit=9,
        )
        assert res.wins_p1 + res.wins_p2 + res.draws == 8

    def test_dual_eval_selects_rows(self):
        import jax.numpy as jnp

        from die_e_tpu.arena.versus import dual_eval_fn

        v1 = init_params(NET, jax.random.PRNGKey(10))
        v2 = init_params(NET, jax.random.PRNGKey(11))
        obs = jax.random.normal(jax.random.PRNGKey(13), (4, 3, 3, 3))
        use1 = jnp.asarray([True, False, True, False])
        dual = dual_eval_fn(EVAL)
        p, v = dual((v1, v2, use1), obs)
        p1, v1_ = EVAL(v1, obs)
        p2, v2_ = EVAL(v2, obs)
        np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(p1[0]))
        np.testing.assert_array_equal(np.asarray(p[1]), np.asarray(p2[1]))
        np.testing.assert_array_equal(np.asarray(v[2]), np.asarray(v1_[2]))
        np.testing.assert_array_equal(np.asarray(v[3]), np.asarray(v2_[3]))

    def test_dual_eval_cached(self):
        from die_e_tpu.arena.versus import dual_eval_fn

        assert dual_eval_fn(EVAL) is dual_eval_fn(EVAL)

    def test_record_path_matches_schema(self, tmp_path):
        v1 = init_params(NET, jax.random.PRNGKey(10))
        res = play(
            ttt.ENV, EVAL, Player(Agent.MODEL, v1), Player(Agent.MODEL, v1),
            jax.random.PRNGKey(14), MCTS_CFG, num_games=4, round_limit=9,
            record=True,
        )
        assert len(res.games) == 4
        for g in res.games:
            assert g.player1 == "model" and g.player2 == "model"
