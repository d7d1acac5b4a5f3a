"""Game engine registry.

Each module follows the protocol documented in toybox_tpu/games/common.py.
"""

from toybox_tpu.games import amidar, breakout, gridworld, space_invaders

GAMES = {
    "amidar": amidar,
    "breakout": breakout,
    "gridworld": gridworld,
    "space_invaders": space_invaders,
}


def get_game(name: str):
    try:
        return GAMES[name]
    except KeyError:
        raise ValueError(f"unknown game {name!r}; have {sorted(GAMES)}") from None


def register_game(name: str, module) -> None:
    GAMES[name] = module
