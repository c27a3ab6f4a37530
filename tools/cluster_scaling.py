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

Usage:  python tools/cluster_scaling.py  [env: SPARK_GRAFT_SF_DIR,
        SPARK_GRAFT_MULTIPLY (default 64), SPARK_GRAFT_SCALE_REPEATS]
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
EXEC_CORES = 8
CONFIGS = {  # label -> total executor cores
    "1x8": 8,
    "2x8": 16,
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
    # one worker offering 16 cores; executors (8 cores each) are
    # separate JVMs under it
    _sbin(
        "start-worker.sh", MASTER_URL,
        "-c", "16", "-m", "24g", env=env,
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
            "--conf", "spark.executor.memory=6g",
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
    thr_a, thr_b = best["1x8"]["value"], best["2x8"]["value"]
    print(json.dumps({
        "metric": "standalone-cluster executor scaling "
                  "(1 executor x 8 cores vs 2 executors x 8 cores, "
                  "separate JVMs, one box)",
        "unit": "docs/sec",
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "multiply": MULTIPLY,
        "n_docs": best["2x8"]["n_docs"],
        "throughput_1x8": thr_a,
        "throughput_2x8": thr_b,
        "build_sec_1x8": best["1x8"]["build_sec"],
        "build_sec_2x8": best["2x8"]["build_sec"],
        "speedup": round(thr_b / thr_a, 3),
        "scaling_efficiency": round(thr_b / thr_a / 2, 3),
        "value": thr_b,
    }))


if __name__ == "__main__":
    main()
