"""Load-armed bench watcher (r13, verdict task 1).

Chases a gate-passing floor record by firing `bench.py` only inside
verifiably quiet host windows. The r12 lesson series, encoded:

  * ARM when the 1-minute loadavg (host-wide, read before we add any
    load of our own) sits under ``ARM_LOAD1`` — stricter than the
    gate's 2.0 so the ~9-minute run that follows has margin for normal
    drift — AND the warmed median-of-3 spawn probe (the same
    ``bench._cpu_probe_par_median`` the gate itself reads) is at or
    under ``ARM_SPAWN``, slightly stricter than the gate's 0.72.
  * Then SETTLE for 75 s before firing: the arming probe's own 32-way
    warm spin + 3x8 spawns inflate loadavg, and r12_i fired straight
    into that self-made load and failed its own gate (load1_prerun
    read our probe tail). The settle lets loadavg decay below the
    arming threshold again; if it hasn't, the window wasn't real.
  * Fire ONE attempt, record the detail under
    ``bench_archive/bench_detail_local_<tag>_<letter>.json``, append a
    probe/attempt log line to ``bench_archive/watcher_<tag>.jsonl``.
  * STOP on success: a ``quiet_gate.pass: true`` record with core36
    under ``--target`` (default: the current certified floor). Keep
    cycling otherwise, with a cooldown after every attempt.
  * A ``bench_archive/.watcher_pause`` file suspends arming (touch it
    before running pytest / correctness sweeps from the same host so
    the watcher never fires into self-inflicted load; remove after).
  * Every ``TREND_S`` seconds a ``trend`` record is logged REGARDLESS
    of arming state (r14 verdict task 2): late-r14 windows showed
    load1 quiet (0.04-0.21) while warmed spawn medians sat 1.03-1.24
    against the 0.70 arming bar — contention the namespace loadavg no
    longer sees. The arming-path ``probe`` lines only exist when load1
    is already under the bar, so they cannot distinguish "persistent
    host slowdown" from "episodes"; the unconditional trend series
    can. While paused, the trend records load1 only (tagged
    ``paused``) so our own pytest/sweep load never contaminates the
    spawn series. ``--summarize`` prints the per-hour trend quantiles
    for SCALE_TREND.md.

Never relaxes any gate threshold — a window that refuses to stay quiet
leaves the floor where it is (r12 verdict: "do NOT relax the gate").

Usage: python3 tools/bench_watcher.py [--tag r13] [--target 32.35]
                                      [--max-attempts 12] [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root module; reuses the gate's probes)

ARM_LOAD1 = 0.20   # r12 watcher arming bar (gate bar is 2.0)
ARM_SPAWN = 0.70   # warmed spawn median arming bar (gate bar is 0.72)
SETTLE_S = 75      # r12_i lesson: let our own probe load decay
# Post-settle veto bar: the arming probe itself (32-way spin + 3x8
# spawns, ~8 s full-width) pushes load1 up ~0.8 and only decays ~3.5x
# over the 75 s settle — a genuinely quiet host reads ~0.2-0.3 here
# from our own probe alone, so vetoing at ARM_LOAD1 would reject nearly
# every real window. 0.5 separates probe decay from a neighbor arriving
# mid-settle, and stays far under the gate's 2.0 prerun bar.
SETTLE_LOAD1 = 0.50
POLL_S = 60
COOLDOWN_S = 180
TREND_S = 1800  # unconditional regime-trend probe period (r14 task 2)


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _log(path: str, rec: dict) -> None:
    rec["t"] = round(time.time(), 1)
    with open(path, "a") as fh:
        fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
    print(json.dumps(rec, separators=(",", ":")), flush=True)


def summarize(log_path: str) -> None:
    """Print per-hour quantiles of the probe/trend series — the
    day-scale view SCALE_TREND.md needs to call persistent-regime vs
    episode (r14 verdict task 2). Paused trend records carry no
    spawn_med and are excluded from the spawn columns by construction."""
    buckets: dict[int, list[tuple[float, "float | None"]]] = {}
    try:
        with open(log_path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("event") not in ("probe", "trend"):
                    continue
                hour = int(rec["t"] // 3600)
                buckets.setdefault(hour, []).append(
                    (rec.get("load1"), rec.get("spawn_med"))
                )
    except OSError as exc:
        print(f"no log: {exc}", file=sys.stderr)
        return
    print("hour_utc  n  load1_med  spawn_med_med  spawn_med_max  n_spawn")
    for hour in sorted(buckets):
        rows = buckets[hour]
        loads = sorted(r[0] for r in rows if r[0] is not None)
        spawns = sorted(r[1] for r in rows if r[1] is not None)
        med = lambda xs: xs[len(xs) // 2] if xs else float("nan")  # noqa: E731
        stamp = time.strftime("%m-%d %Hh", time.gmtime(hour * 3600))
        print(f"{stamp}  {len(rows):2d}  {med(loads):9.2f}  "
              f"{med(spawns):13.3f}  "
              f"{(max(spawns) if spawns else float('nan')):13.3f}  "
              f"{len(spawns):7d}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--target", type=float, default=32.35)
    ap.add_argument("--max-attempts", type=int, default=12)
    ap.add_argument("--once", action="store_true",
                    help="fire at most one attempt, then exit")
    ap.add_argument("--summarize", action="store_true",
                    help="print per-hour probe/trend quantiles and exit")
    args = ap.parse_args()

    archive = os.path.join(REPO, "bench_archive")
    os.makedirs(archive, exist_ok=True)
    log_path = os.path.join(archive, f"watcher_{args.tag}.jsonl")
    pause_path = os.path.join(archive, ".watcher_pause")
    stop_path = os.path.join(archive, ".watcher_stop")
    if args.summarize:
        summarize(log_path)
        return 0

    # resume lettering after any attempts already recorded for this tag
    taken = {
        fn.rsplit("_", 1)[-1].split(".")[0]
        for fn in os.listdir(archive)
        if fn.startswith(f"bench_detail_local_{args.tag}_")
    }
    letters = [c for c in string.ascii_lowercase if c not in taken]

    attempts = 0
    last_trend = 0.0
    while attempts < args.max_attempts and letters:
        if os.path.exists(stop_path):
            _log(log_path, {"event": "stop_file"})
            return 0
        # Unconditional regime-trend record (r14 verdict task 2): fires
        # even when load1 would veto arming, so the series can separate
        # a persistent host slowdown from episodes. While paused, log
        # load1 only — our own pytest/sweep load would contaminate the
        # spawn series, and the probe itself adds load we promised not
        # to add during heavy work.
        if time.time() - last_trend >= TREND_S:
            last_trend = time.time()
            if os.path.exists(pause_path):
                _log(log_path, {"event": "trend", "paused": True,
                                "load1": _load1()})
            else:
                _log(log_path, {"event": "trend", "load1": _load1(),
                                "spawn_med": bench._cpu_probe_par_median()})
        if os.path.exists(pause_path):
            time.sleep(POLL_S)
            continue
        l1 = _load1()
        if l1 >= ARM_LOAD1:
            time.sleep(POLL_S)
            continue
        spawn = bench._cpu_probe_par_median()
        _log(log_path, {"event": "probe", "load1": l1, "spawn_med": spawn})
        if spawn > ARM_SPAWN:
            time.sleep(POLL_S)
            continue
        time.sleep(SETTLE_S)  # let our own probe load decay (r12_i)
        l1b = _load1()
        if l1b >= SETTLE_LOAD1 or os.path.exists(pause_path):
            _log(log_path, {"event": "settle_veto", "load1": l1b})
            continue
        letter = letters.pop(0)
        detail = os.path.join(
            archive, f"bench_detail_local_{args.tag}_{letter}.json"
        )
        _log(log_path, {"event": "fire", "attempt": letter, "load1": l1b})
        env = dict(os.environ, SPARK_GRAFT_BENCH_DETAIL=detail)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True,
        )
        attempts += 1
        rec: dict = {"event": "attempt_done", "attempt": letter,
                     "rc": proc.returncode,
                     "wall": round(time.time() - t0, 1)}
        try:
            with open(detail) as fh:
                d = json.load(fh)
            rec.update(
                core36=d.get("core36"),
                gate=d.get("quiet_gate", {}).get("pass"),
                load1_prerun=d.get("quiet_gate", {}).get("load1_prerun"),
                spawn_max=d.get("quiet_gate", {}).get("spawn_max"),
            )
        except Exception as exc:  # noqa: BLE001
            rec["detail_err"] = str(exc)[:200]
        _log(log_path, rec)
        if rec.get("gate") and rec.get("core36") is not None \
                and rec["core36"] < args.target:
            _log(log_path, {"event": "success", "attempt": letter,
                            "core36": rec["core36"]})
            return 0
        if args.once:
            return 0
        time.sleep(COOLDOWN_S)
    _log(log_path, {"event": "exhausted", "attempts": attempts})
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
