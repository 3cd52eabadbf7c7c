"""Persistent dev exec server: keeps a warm Python+JAX process and runs job
files on demand (works around very slow per-process JAX/backend startup).

Usage:
  python tools/devserver.py /tmp/jobs &        # start (one-time slow init)
  echo 'print(1+1)' > /tmp/jobs/001.py         # submit
  # wait for /tmp/jobs/001.done; output in /tmp/jobs/001.out

Jobs execute in a FRESH module namespace each time but share the process
(imports stay warm, jit caches persist). `ya_vo_tpu` modules are reloaded on
every job so code edits are picked up.

LIFETIME LIMITS (round-2 postmortem: a devserver left running after the
builder's session held the single tunneled TPU chip, so the driver's fresh
bench process hung at backend init and the round's perf number was lost):
  * the server EXITS after --idle-timeout seconds without a job (default
    20 min) and unconditionally after --exit-after seconds (default 3 h);
  * it writes `<jobdir>/_devserver.pid` at startup so bench.py can kill a
    stale instance by exact PID (never by pattern) before attaching.
"""

import argparse
import atexit
import io
import os
import sys
import time
import traceback

_p = argparse.ArgumentParser()
_p.add_argument("jobdir", nargs="?", default="/tmp/jobs")
_p.add_argument("--idle-timeout", type=float, default=1200.0,
                help="exit after this many seconds without a job")
_p.add_argument("--exit-after", type=float, default=3 * 3600.0,
                help="unconditional lifetime cap in seconds")
_args = _p.parse_args()

JOB_DIR = _args.jobdir
os.makedirs(JOB_DIR, exist_ok=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PIDFILE = os.path.join(JOB_DIR, "_devserver.pid")


def _write_pidfile():
    with open(PIDFILE, "w") as f:
        f.write(f"{os.getpid()} started={time.time():.0f}\n")

    def _cleanup():
        try:
            os.remove(PIDFILE)
        except OSError:
            pass

    atexit.register(_cleanup)


def reload_repo_modules():
    # delete so fresh import re-executes module bodies (handles new files too);
    # covers ya_vo_tpu AND test modules (pytest caches those in sys.modules)
    for m, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if m.startswith("ya_vo_tpu") or (f and f.startswith(REPO)):
            del sys.modules[m]


def main():
    _write_pidfile()
    print(f"[devserver] watching {JOB_DIR} (pid={os.getpid()}, "
          f"idle-timeout={_args.idle_timeout:.0f}s, "
          f"exit-after={_args.exit_after:.0f}s)", flush=True)
    done_path = os.path.join(JOB_DIR, "_ready")
    with open(done_path, "w") as f:
        f.write("ready")
    t_start = time.time()
    t_last_job = t_start
    while True:
        now = time.time()
        if now - t_last_job > _args.idle_timeout:
            print(f"[devserver] idle {now - t_last_job:.0f}s > "
                  f"{_args.idle_timeout:.0f}s: exiting (frees the chip)",
                  flush=True)
            return
        if now - t_start > _args.exit_after:
            print(f"[devserver] lifetime cap {_args.exit_after:.0f}s "
                  f"reached: exiting (frees the chip)", flush=True)
            return
        jobs = sorted(
            f for f in os.listdir(JOB_DIR)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(JOB_DIR, f[:-3] + ".done"))
        )
        if not jobs:
            time.sleep(0.2)
            continue
        name = jobs[0]
        stem = name[:-3]
        path = os.path.join(JOB_DIR, name)
        out_path = os.path.join(JOB_DIR, stem + ".out")
        t0 = time.time()
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        code = 0
        try:
            with open(path) as f:
                src = f.read()
            reload_repo_modules()
            sys.stdout = sys.stderr = buf
            ns = {"__name__": "__main__", "__file__": path}
            exec(compile(src, path, "exec"), ns)
        except SystemExit as e:
            code = int(e.code or 0)
        except BaseException:
            traceback.print_exc()
            code = 1
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        dt = time.time() - t0
        t_last_job = time.time()
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[devserver] exit={code} wall={dt:.2f}s\n")
        with open(os.path.join(JOB_DIR, stem + ".done"), "w") as f:
            f.write(str(code))
        print(f"[devserver] {name} -> exit={code} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
