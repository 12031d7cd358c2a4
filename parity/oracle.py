"""ctypes bridge to the C++ parity oracle (parity/oracle.cpp).

Builds liboracle.so on demand (cached by mtime) with the system g++; no
external Python build dependencies needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_LIB = os.path.join(_DIR, "liboracle.so")

NUM_ACTIONS = 1352


def _build():
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
    )


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            _build()
        _lib = ctypes.CDLL(_LIB)
        _lib.bg_legal_mask.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib.bg_apply_action.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib.bg_dice.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
        ]
        _lib.bg_run_trajectory.argtypes = [
            ctypes.c_uint32, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib.bg_run_trajectory.restype = ctypes.c_int
    return _lib


def legal_mask(board, bar, off, roll, player) -> np.ndarray:
    pts = np.asarray(board, np.int8)
    bar = np.asarray(bar, np.int32)
    off = np.asarray(off, np.int32)
    out = np.zeros(NUM_ACTIONS, np.uint8)
    lib().bg_legal_mask(
        pts.ctypes.data, bar.ctypes.data, off.ctypes.data,
        int(roll[0]), int(roll[1]), int(player), out.ctypes.data,
    )
    return out.astype(bool)


def dice(seed: int, cnt: int, salt: int):
    out = np.zeros(2, np.int32)
    lib().bg_dice(seed & 0xFFFFFFFF, cnt & 0xFFFFFFFF, salt & 0xFFFFFFFF,
                  out.ctypes.data)
    return int(out[0]), int(out[1])


def run_trajectory(seed: int, max_steps: int = 2000):
    """Play a full seeded game in the C++ oracle; returns a dict of per-step
    state records (see oracle.cpp bg_run_trajectory)."""
    boards = np.zeros((max_steps, 24), np.int8)
    bars = np.zeros((max_steps, 2), np.int32)
    offs = np.zeros((max_steps, 2), np.int32)
    rolls = np.zeros((max_steps, 2), np.int32)
    players = np.zeros(max_steps, np.int32)
    seconds = np.zeros(max_steps, np.int32)
    actions = np.zeros(max_steps, np.int32)
    n = lib().bg_run_trajectory(
        seed & 0xFFFFFFFF, max_steps,
        boards.ctypes.data, bars.ctypes.data, offs.ctypes.data,
        rolls.ctypes.data, players.ctypes.data, seconds.ctypes.data,
        actions.ctypes.data,
    )
    return {
        "n": n,
        "boards": boards[:n],
        "bars": bars[:n],
        "offs": offs[:n],
        "rolls": rolls[:n],
        "players": players[:n],
        "seconds": seconds[:n],
        "actions": actions[:n],
    }
