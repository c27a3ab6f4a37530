"""Two-JVM standalone-cluster scaling probe (north-rule evidence).

``bench.py --scaling`` measures N-vs-4N cores inside ONE JVM
(local[4] vs local[16]); this sandbox cannot run a real multi-node
cluster, so this tool gets as close as one box allows: a Spark
STANDALONE master + worker on localhost, with the build job submitted
as

  A: 1 executor  × 8 cores   (--total-executor-cores 8)
  B: 2 executors × 8 cores   (--total-executor-cores 16)

Each executor is its own JVM process, so A→B adds a second JVM the way
a second node would (separate heaps, shuffle served over the
BlockTransferService, results merged across executor boundaries) —
the one thing it cannot separate is the shared memory bus, which is
exactly the variable the single-JVM runs couldn't isolate:

  * if B/A ≈ 2 (efficiency ≥ 0.8): the dataflow scales across
    executors, and the single-JVM local[4]→local[16] shortfall is the
    box's memory bus, not the job;
  * if B/A ≪ 2 at the same per-executor core count: the dataflow owns
    the problem.

Legs run interleaved (A,B,A,B) with best-of-N per config, scratch on
/dev/shm (BASELINE.md host-variance protocol).  Prints one JSON line.

Executor topology is parameterized: SPARK_GRAFT_EXEC_CORES (cores per
executor JVM, default 8) and SPARK_GRAFT_EXECUTORS ("A,B" executor
counts for the two legs, default "1,2").  The north rule's literal
"N and 4N executors" shape is
``SPARK_GRAFT_EXEC_CORES=2 SPARK_GRAFT_EXECUTORS=2,8`` — 2 vs 8
two-core executor JVMs (a 4x executor-count ratio at fixed executor
size, the way a real cluster scales out).

Usage:  python tools/cluster_scaling.py  [env: SPARK_GRAFT_SF_DIR,
        SPARK_GRAFT_MULTIPLY (default 64), SPARK_GRAFT_SCALE_REPEATS,
        SPARK_GRAFT_EXEC_CORES, SPARK_GRAFT_EXECUTORS,
        SPARK_GRAFT_EXEC_MEM]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTIPLY = int(os.environ.get("SPARK_GRAFT_MULTIPLY", "64"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
_N_EXECS = [
    int(x) for x in os.environ.get("SPARK_GRAFT_EXECUTORS", "1,2").split(",")
]
if len(_N_EXECS) != 2 or _N_EXECS[0] >= _N_EXECS[1]:
    # fail BEFORE any multi-minute leg runs, not at the final unpack
    raise SystemExit(
        "SPARK_GRAFT_EXECUTORS must be two increasing counts, e.g. '2,8'"
    )
EXEC_MEM = os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g")


def _mem_mb(s: str) -> int:
    s = s.strip().lower()
    if s.endswith("g"):
        return int(s[:-1]) * 1024
    if s.endswith("m"):
        return int(s[:-1])
    return int(s)


# worker must be able to host the BIGGEST leg's executors — a worker
# smaller than n_execs * executor.memory makes the standalone master
# silently launch fewer executors and the leg label would lie
WORKER_MEM_MB = max(24 * 1024, _N_EXECS[1] * _mem_mb(EXEC_MEM) + 2048)
CONFIGS = {  # label -> total executor cores
    f"{n}x{EXEC_CORES}": n * EXEC_CORES for n in _N_EXECS
}


def _sbin(script, *args, env=None):
    subprocess.run(
        [os.path.join(SPARK_HOME, "sbin", script), *args],
        check=True, capture_output=True, text=True, env=env,
    )


def start_cluster(scratch):
    env = dict(os.environ)
    env.setdefault("SPARK_MASTER_HOST", "127.0.0.1")
    env.setdefault("SPARK_LOG_DIR", os.path.join(scratch, "logs"))
    env.setdefault("SPARK_WORKER_DIR", os.path.join(scratch, "work"))
    env.setdefault("SPARK_PID_DIR", os.path.join(scratch, "pids"))
    _sbin("start-master.sh", env=env)
    # one worker offering enough cores for the biggest leg; executors
    # are separate JVMs under it
    _sbin(
        "start-worker.sh", MASTER_URL,
        "-c", str(max(CONFIGS.values())), "-m", f"{WORKER_MEM_MB}m",
        env=env,
    )
    # wait for the worker to register
    time.sleep(5)
    return env


def stop_cluster(env):
    for s in ("stop-worker.sh", "stop-master.sh"):
        try:
            _sbin(s, env=env)
        except subprocess.CalledProcessError:
            pass


def run_leg(zpath, total_cores, scratch):
    job = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "build_index_job.py")
    idx_dir = tempfile.mkdtemp(prefix=f"se_clu_{total_cores}_", dir=scratch)
    try:
        cmd = [
            os.path.join(SPARK_HOME, "bin", "spark-submit"),
            "--master", MASTER_URL,
            "--deploy-mode", "client",
            "--conf", f"spark.executor.cores={EXEC_CORES}",
            "--conf", f"spark.executor.memory={EXEC_MEM}",
            "--conf", f"spark.cores.max={total_cores}",
            "--conf", "spark.driver.memory=4g",
            "--conf", f"spark.sql.shuffle.partitions={total_cores * 2}",
            "--conf", f"spark.local.dir={scratch}/local",
            "--py-files", zpath,
            job,
            "--input", SF_DIR,
            "--output", idx_dir,
            "--multiply", str(MULTIPLY),
            "--simhash-bits", "64",
            "--id-order", "hash",
        ]
        p = subprocess.run(cmd, capture_output=True, text=True)
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise RuntimeError(f"cluster job failed at {total_cores} cores")
        return json.loads(lines[-1])
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def main():
    from tools.make_pyfiles import build_zip

    zpath = build_zip()
    scratch = (
        "/dev/shm/se_cluster" if os.path.isdir("/dev/shm")
        else tempfile.mkdtemp(prefix="se_cluster_")
    )
    os.makedirs(scratch, exist_ok=True)
    env = start_cluster(scratch)
    best = {}
    try:
        for rep in range(REPEATS):
            for label, cores in CONFIGS.items():
                r = run_leg(zpath, cores, scratch)
                if label not in best or r["build_sec"] < best[label]["build_sec"]:
                    best[label] = r
    finally:
        stop_cluster(env)
        shutil.rmtree(scratch, ignore_errors=True)
    (la, lb), ratio = list(CONFIGS), _N_EXECS[1] / _N_EXECS[0]
    thr_a, thr_b = best[la]["value"], best[lb]["value"]
    print(json.dumps({
        "metric": "standalone-cluster executor scaling "
                  f"({la.replace('x', ' executor JVMs x ')} cores vs "
                  f"{lb.replace('x', ' executor JVMs x ')} cores, "
                  "separate JVMs, one box)",
        "unit": "docs/sec",
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "multiply": MULTIPLY,
        "n_docs": best[lb]["n_docs"],
        f"throughput_{la}": thr_a,
        f"throughput_{lb}": thr_b,
        f"build_sec_{la}": best[la]["build_sec"],
        f"build_sec_{lb}": best[lb]["build_sec"],
        "speedup": round(thr_b / thr_a, 3),
        "scaling_efficiency": round(thr_b / thr_a / ratio, 3),
        "value": thr_b,
    }))


if __name__ == "__main__":
    main()
