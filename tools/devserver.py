"""Persistent dev exec server: keeps a warm Python+JAX process and runs job
files on demand (works around very slow per-process JAX/backend startup).

Usage:
  python tools/devserver.py /tmp/jobs &        # start (one-time slow init)
  echo 'print(1+1)' > /tmp/jobs/001.py         # submit
  # wait for /tmp/jobs/001.done; output in /tmp/jobs/001.out

Jobs execute in a FRESH module namespace each time but share the process
(imports stay warm, jit caches persist). `ya_vo_tpu` modules are reloaded on
every job so code edits are picked up.
"""

import importlib
import io
import os
import sys
import time
import traceback

JOB_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jobs"
os.makedirs(JOB_DIR, exist_ok=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def reload_repo_modules():
    # delete so fresh import re-executes module bodies (handles new files too);
    # covers ya_vo_tpu AND test modules (pytest caches those in sys.modules)
    for m, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if m.startswith("ya_vo_tpu") or (f and f.startswith(REPO)):
            del sys.modules[m]


def main():
    print(f"[devserver] watching {JOB_DIR}", flush=True)
    done_path = os.path.join(JOB_DIR, "_ready")
    with open(done_path, "w") as f:
        f.write("ready")
    while True:
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
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[devserver] exit={code} wall={dt:.2f}s\n")
        with open(os.path.join(JOB_DIR, stem + ".done"), "w") as f:
            f.write(str(code))
        print(f"[devserver] {name} -> exit={code} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
