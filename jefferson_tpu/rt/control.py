"""Live interactive source control — the reference's keyboard loop.

The reference's defining interactive feature is a user moving the sound
source in real time while the audio follows: GLUT key handlers mutate the
source's Cartesian ``coordinates`` each frame (reference:
Jefferson/src/graphics.cu:487-601) and the audio thread reads them via
``updateFromCartesian`` (graphics.cu:376-386).  This module is that control
surface re-built headless: a thread-safe Cartesian position state with the
reference's exact key semantics, plus a raw-TTY reader so ``jefferson-rt
--keys`` gets WASD/arrow control in any terminal (no GL window needed).

Key map (reference graphics.cu:487-601, step ``temp`` = 0.05,
graphics.cu:21):

  w/s     move the source up/down          (y +/- 0.05)
  a/d     move left/right                  (x -/+ 0.05)
  left/right arrows                        (x -/+ 0.05, same as a/d)
  up/down arrows    move away/toward       (z -/+ 0.05)
  r       reset the source to (0.5, 0, 0)  (graphics.cu:495-502)
  q/ESC   quit                             (graphics.cu:526-535)

Every move is guarded so the resulting elevation stays above -40 deg (the
KEMAR grid's floor — the clamp at graphics.cu:601 region); the guard
reproduces the reference's exact (quirky) per-key conditions, including
that w/s are unguarded while y >= 0.
"""

from __future__ import annotations

import math
import threading

KEY_STEP = 0.05  # reference graphics.cu:21 ``float temp = 0.05f``

# initial coordinates: the SoundSource constructor state
# (reference: Jefferson/src/SoundSource.cu:8-10)
INITIAL_XYZ = (0.0, 0.0, 0.5)
# the 'r' key's reset position (reference: graphics.cu:499-501 — note it
# differs from the constructor state; preserved as-is)
RESET_XYZ = (0.5, 0.0, 0.0)

_DEG = 180.0 / math.pi


def _ele_deg(y: float, horiz: float) -> float:
    """atan(y / horiz) in degrees with the C semantics at horiz == 0
    (atan(+-inf) = +-90)."""
    return math.atan2(y, horiz) * _DEG if horiz >= 0 else math.atan(y / horiz) * _DEG


class SourceControl:
    """Thread-safe live source position (the GLUT-handler state, headless).

    The control thread (TTY reader, daemon command handler, a test) calls
    ``apply_key``/``move_to``; the audio thread reads ``coordinates()`` once
    per block and feeds it to ``StreamingSpatializer.set_position_cartesian``
    — the same writer/reader split as the reference's graphics/audio threads
    (benign race there; an actual lock here).
    """

    def __init__(self, xyz: tuple[float, float, float] = INITIAL_XYZ):
        self._lock = threading.Lock()
        self.x, self.y, self.z = (float(v) for v in xyz)
        self.quit = False
        self.moves = 0  # how many keys actually changed the position

    def coordinates(self) -> tuple[float, float, float]:
        with self._lock:
            return (self.x, self.y, self.z)

    def move_to(self, x: float, y: float, z: float) -> None:
        with self._lock:
            self.x, self.y, self.z = float(x), float(y), float(z)
            self.moves += 1

    def apply_key(self, key: str) -> bool:
        """Apply one key (see module key map). Returns False on quit."""
        step = KEY_STEP
        with self._lock:
            x, y, z = self.x, self.y, self.z
            if key in ("q", "esc"):
                self.quit = True
                return False
            if key in ("r", "R"):
                self.x, self.y, self.z = RESET_XYZ
                self.moves += 1
                return True
            moved = False
            if key in ("w", "W"):
                # guard: while y >= 0 always allowed; below the horizon only
                # if the result stays above -40 deg (graphics.cu:505-507)
                dist = math.sqrt(x * x + z * z)
                if y >= 0 or _ele_deg(y + step, dist) > -40:
                    self.y = y + step
                    moved = True
            elif key in ("s", "S"):
                dist = math.sqrt(x * x + z * z)
                if y >= 0 or _ele_deg(y - step, dist) > -40:
                    self.y = y - step
                    moved = True
            elif key in ("a", "A", "left"):
                if _ele_deg(y, math.sqrt((x - step) ** 2 + z * z)) > -40:
                    self.x = x - step
                    moved = True
            elif key in ("d", "D", "right"):
                if _ele_deg(y, math.sqrt((x + step) ** 2 + z * z)) > -40:
                    self.x = x + step
                    moved = True
            elif key == "up":  # away from the listener (graphics.cu:548-551)
                if _ele_deg(y, math.sqrt(x * x + (z - step) ** 2)) > -40:
                    self.z = z - step
                    moved = True
            elif key == "down":
                if _ele_deg(y, math.sqrt(x * x + (z + step) ** 2)) > -40:
                    self.z = z + step
                    moved = True
            if moved:
                self.moves += 1
            return True


def spherical_to_control_xyz(azi_deg: float, ele_deg: float, r: float):
    """Cartesian point that ``updateFromCartesian`` reads back as exactly
    (azi, ele, r) — the inverse of the CARTESIAN reading convention
    (reference: Jefferson/src/SoundSource.cu:20-36):

        x = -r cos(ele) sin(azi),  y = r sin(ele),  z = -r cos(ele) cos(azi)

    NOT trajectory.spatial.spherical_to_cartesian: that ports the
    reference's ``updateFromSpherical`` quirk (no cos(ele) factor on the
    horizontal components), whose output reads back MIRRORED in azimuth
    through updateFromCartesian — fine for the offline planner (which keeps
    the given angles and only takes |xyz| for the radius) but wrong for a
    live control surface feeding set_position_cartesian."""
    a = math.radians(azi_deg)
    e = math.radians(ele_deg)
    return (
        -r * math.cos(e) * math.sin(a),
        r * math.sin(e),
        -r * math.cos(e) * math.cos(a),
    )


def decode_keys(data: bytes) -> list[str]:
    """Raw TTY bytes -> key names (handles ANSI arrow escape sequences)."""
    keys: list[str] = []
    i = 0
    arrows = {0x41: "up", 0x42: "down", 0x43: "right", 0x44: "left"}
    while i < len(data):
        b = data[i]
        if b == 0x1B:
            if i + 2 < len(data) and data[i + 1] in (0x5B, 0x4F) and data[i + 2] in arrows:
                keys.append(arrows[data[i + 2]])
                i += 3
                continue
            keys.append("esc")
            i += 1
            continue
        ch = chr(b)
        if ch.isprintable():
            keys.append(ch)
        i += 1
    return keys


def tty_key_loop(control: SourceControl, stdin=None, on_key=None) -> None:
    """Blocking raw-mode key loop on a TTY; returns when the user quits.

    Run in a daemon thread next to the audio loop (``jefferson-rt --keys``).
    ``on_key`` (optional) is called with (key, (x, y, z)) after each applied
    key — the CLI uses it to print the live position readout.
    """
    import sys

    stdin = stdin if stdin is not None else sys.stdin
    fd = stdin.fileno()
    import termios
    import tty

    old = termios.tcgetattr(fd)
    try:
        tty.setcbreak(fd)
        import os
        import select

        while not control.quit:
            ready, _, _ = select.select([fd], [], [], 0.1)
            if not ready:
                continue
            data = os.read(fd, 16)
            if not data:
                break
            for key in decode_keys(data):
                alive = control.apply_key(key)
                if on_key is not None:
                    on_key(key, control.coordinates())
                if not alive:
                    return
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


def start_key_thread(control: SourceControl, on_key=None) -> threading.Thread | None:
    """Start the TTY listener if stdin is a terminal; None otherwise."""
    import sys

    try:
        if not sys.stdin.isatty():
            return None
    except Exception:
        return None
    t = threading.Thread(
        target=tty_key_loop, args=(control,), kwargs={"on_key": on_key}, daemon=True
    )
    t.start()
    return t
