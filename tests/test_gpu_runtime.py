"""GPU runtime plumbing (reference utils/gpu_utils.py:115-148): the
session conf declared by build_conf must materialize as per-task
scheduler assignments readable through TaskContext.resources().

The container has no GPU, so the end-to-end test runs a local-cluster
session against a FAKE discovery script (Spark's own mechanism for
advertising resources) — this drives the real scheduler/TaskContext
path, not a mock. A separate skip-gated test covers a physical GPU
host."""

from __future__ import annotations

import json
import os
import shutil
import stat
import subprocess
import sys

import pytest

from customkb_spark.session import build_conf, get_task_resource_addresses

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_get_task_resource_addresses_off_task_and_cpu_only(spark):
    # driver side: no TaskContext → empty, never raises
    assert get_task_resource_addresses() == []
    # on-task, CPU-only session: resources() has no gpu entry → empty
    out = (
        spark.sparkContext.parallelize([0], 1)
        .mapPartitions(lambda _: [get_task_resource_addresses("gpu")])
        .collect()
    )
    assert out == [[]]


def test_task_resources_assigned_via_fake_discovery(tmp_path):
    """Two tasks, each requiring 1 GPU of the 2 a fake discovery script
    advertises: the scheduler must hand each task a DISTINCT address,
    and get_task_resource_addresses must read it. Runs in a subprocess
    (its own local-cluster session; the shared fixture session cannot
    be reconfigured)."""
    disc = tmp_path / "disc.sh"
    disc.write_text('#!/bin/sh\necho \'{"name":"gpu","addresses":["0","1"]}\'\n')
    disc.chmod(disc.stat().st_mode | stat.S_IEXEC)
    script = f"""
import json
from pyspark.sql import SparkSession
from customkb_spark.session import task_resource_report
spark = (SparkSession.builder.master('local-cluster[1,2,1024]')
    .appName('gpu-probe')
    .config('spark.task.resource.gpu.amount', '1')
    .config('spark.executor.resource.gpu.amount', '2')
    .config('spark.executor.resource.gpu.discoveryScript', {str(disc)!r})
    .config('spark.worker.resource.gpu.amount', '2')
    .config('spark.worker.resource.gpu.discoveryScript', {str(disc)!r})
    .getOrCreate())
print("REPORT:" + json.dumps(task_resource_report(spark, num_slots=2)))
spark.stop()
"""
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("REPORT:"))
    report = json.loads(line[len("REPORT:"):])
    # each task got exactly one address, and together they cover both GPUs
    assert sorted(len(a) for a in report) == [1, 1]
    assert sorted(a[0] for a in report) == ["0", "1"]


@pytest.mark.skipif(shutil.which("nvidia-smi") is None, reason="no GPU on this host")
def test_task_resources_on_physical_gpu(tmp_path):
    """On a real GPU host: the SPARK_GRAFT_GPUS_PER_TASK env route
    through build_conf + a real discovery script must surface the
    device in TaskContext.resources()."""
    conf = build_conf(cpus=2, gpus_per_task=1.0)
    assert conf["spark.task.resource.gpu.amount"] == "1.0"
    script = tmp_path / "nv_disc.sh"
    script.write_text(
        "#!/bin/sh\n"
        "ADDRS=$(nvidia-smi --query-gpu=index --format=csv,noheader"
        " | paste -sd, - | sed 's/[0-9]*/\"&\"/g')\n"
        'echo {\\"name\\":\\"gpu\\",\\"addresses\\":[$ADDRS]}\n'
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local-cluster[1,1,1024]")
        .appName("gpu-real")
        .config("spark.task.resource.gpu.amount", "1")
        .config("spark.executor.resource.gpu.amount", "1")
        .config("spark.executor.resource.gpu.discoveryScript", str(script))
        .config("spark.worker.resource.gpu.amount", "1")
        .config("spark.worker.resource.gpu.discoveryScript", str(script))
        .getOrCreate()
    )
    try:
        from customkb_spark.session import task_resource_report

        report = task_resource_report(spark, num_slots=1)
        assert report and report[0], "task saw no GPU addresses"
    finally:
        spark.stop()


def test_crossencoder_loads_on_task_gpu(monkeypatch):
    """_get_crossencoder must pass the task's scheduled GPU address as
    the model device (cuda:<addr>), and None off-GPU — verified with a
    fake sentence_transformers module so the device routing is tested
    without the real dependency."""
    import sys
    import types

    from customkb_spark.operators import rerank as R

    captured = {}

    class FakeCE:
        def __init__(self, name, device=None):
            captured[name] = device

    fake = types.ModuleType("sentence_transformers")
    fake.CrossEncoder = FakeCE
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)
    monkeypatch.setattr(R, "_MODELS", {})

    # off-task / CPU session: no gpu resource -> default device
    R._get_crossencoder("m-cpu")
    assert captured["m-cpu"] is None

    # task with a scheduled GPU: pin to its address
    monkeypatch.setattr(
        "customkb_spark.session.get_task_resource_addresses", lambda r="gpu": ["1"]
    )
    R._get_crossencoder("m-gpu")
    assert captured["m-gpu"] == "cuda:1"

    # cache key includes the device: a REUSED python worker whose next
    # task is scheduled a different GPU must load onto that GPU, not
    # serve the first task's cached model
    monkeypatch.setattr(
        "customkb_spark.session.get_task_resource_addresses", lambda r="gpu": ["0"]
    )
    R._get_crossencoder("m-gpu")
    assert captured["m-gpu"] == "cuda:0"
    assert ("m-gpu", "cuda:1") in R._MODELS and ("m-gpu", "cuda:0") in R._MODELS
