from toybox_tpu.core import actions, jsonutil, rng, types
from toybox_tpu.core.actions import ACTION_LOOKUP, ACTION_MEANING, LEGAL_ACTIONS, ale_to_input
from toybox_tpu.core.types import Direction, Input, rgba
