"""Live interactive source control (reference graphics.cu:487-601 semantics)."""

import numpy as np

from jefferson_tpu.engine.stream import StreamingSpatializer
from jefferson_tpu.rt.control import (
    INITIAL_XYZ,
    KEY_STEP,
    RESET_XYZ,
    SourceControl,
    decode_keys,
)
from jefferson_tpu.rt.playout import AudioPlayout
from jefferson_tpu.trajectory.spatial import cartesian_to_spherical


def test_key_steps_match_reference():
    c = SourceControl()
    assert c.coordinates() == INITIAL_XYZ  # SoundSource constructor state
    assert c.apply_key("w")
    assert np.isclose(c.coordinates()[1], KEY_STEP)
    c.apply_key("s")
    c.apply_key("s")
    assert np.isclose(c.coordinates()[1], -KEY_STEP)
    c.apply_key("d")
    assert np.isclose(c.coordinates()[0], KEY_STEP)
    c.apply_key("left")
    c.apply_key("left")
    assert np.isclose(c.coordinates()[0], -KEY_STEP)
    c.apply_key("up")
    assert np.isclose(c.coordinates()[2], 0.5 - KEY_STEP)
    c.apply_key("down")
    assert np.isclose(c.coordinates()[2], 0.5)


def test_reset_quirk_and_quit():
    c = SourceControl()
    c.apply_key("w")
    c.apply_key("d")
    assert c.apply_key("r")
    # the reference's reset position differs from the constructor state
    # (graphics.cu:499-501) — preserved
    assert c.coordinates() == RESET_XYZ
    assert not c.apply_key("q")
    assert c.quit
    c2 = SourceControl()
    assert not c2.apply_key("esc")
    assert c2.quit


def test_elevation_guard_minus_40():
    """Moving below -40 deg elevation is blocked (the KEMAR grid floor,
    reference graphics.cu:505-524)."""
    c = SourceControl()
    for _ in range(200):  # hammer 's': y must stop at the -40 deg guard
        c.apply_key("s")
    x, y, z = c.coordinates()
    ele = float(cartesian_to_spherical(np.asarray([x, y, z]))[1])
    assert ele >= -40.0
    # and sideways moves that would dip below -40 are blocked too
    before = c.coordinates()
    moves_before = c.moves
    c.apply_key("a")  # shrinking horiz distance lowers elevation further
    # either the move was legal (ele still >= -40) or it was refused
    x2, y2, z2 = c.coordinates()
    ele2 = float(cartesian_to_spherical(np.asarray([x2, y2, z2]))[1])
    assert ele2 >= -41.0
    if c.moves == moves_before:
        assert c.coordinates() == before


def test_decode_keys():
    assert decode_keys(b"wasd") == ["w", "a", "s", "d"]
    assert decode_keys(b"\x1b[A\x1b[B\x1b[C\x1b[D") == ["up", "down", "right", "left"]
    assert decode_keys(b"\x1b") == ["esc"]
    assert decode_keys(b"r\x1b[Aq") == ["r", "up", "q"]
    assert decode_keys(b"\x1bOC") == ["right"]  # application-mode arrows


def test_interactive_playout_crossfades_and_deadline(db, config, castanets):
    """The VERDICT round-2 acceptance test: inject position commands between
    blocks of a fake-device playout; the crossfade must fire and the deadline
    stats stay green."""
    control = SourceControl()
    spat = StreamingSpatializer(db, config)
    signal = castanets[:8000]
    fpb = config.frames_per_buffer
    n_sig = len(signal)
    state = {"i": 0, "b": 0}
    # scripted key presses "between blocks" (the key thread's writes)
    schedule = {3: ["d", "d"], 6: ["w"], 9: ["up", "a"], 12: ["r"]}

    def source():
        for key in schedule.get(state["b"], []):
            control.apply_key(key)
        state["b"] += 1
        spat.set_position_cartesian(control.coordinates())
        idx = (np.arange(fpb) + state["i"]) % n_sig
        state["i"] += fpb
        return spat.process_block(signal[idx])

    source.prime = spat.prime
    play = AudioPlayout([source], config)
    stats = play.run_offline(16, stop=lambda: control.quit)
    assert stats.blocks == 16
    assert spat.crossfades >= 3, "position commands must trigger crossfades"
    assert stats.misses <= 1, stats.summary()  # first block may absorb jitter
    assert not play.clipping


def test_interactive_quit_stops_loop(db, config, castanets):
    control = SourceControl()
    spat = StreamingSpatializer(db, config)
    fpb = config.frames_per_buffer
    state = {"b": 0}

    def source():
        state["b"] += 1
        if state["b"] == 5:
            control.apply_key("q")
        spat.set_position_cartesian(control.coordinates())
        return spat.process_block(castanets[:fpb])

    source.prime = spat.prime
    play = AudioPlayout([source], config)
    stats = play.run_offline(100, stop=lambda: control.quit)
    assert stats.blocks == 5
