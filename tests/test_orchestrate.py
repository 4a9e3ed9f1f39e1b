"""Stage orchestration: DAG order, chunk split/join, retries, re-entry
(the Martian runtime analogue, pipeline/orchestrate.py)."""
import json

import pytest

from supernova_tpu.pipeline.orchestrate import (
    Orchestrator,
    StageDef,
    StageError,
)


def _chunk_square(ctx, chunk):
    return chunk["x"] ** 2


def test_dag_order_and_results(tmp_path):
    calls = []

    def a(ctx, done):
        calls.append("a")
        return 1

    def b(ctx, done):
        calls.append("b")
        return done["a"] + 1

    def c(ctx, done):
        calls.append("c")
        return done["a"] + done["b"]

    orch = Orchestrator(tmp_path)
    out = orch.run(
        [
            StageDef("c", c, deps=("a", "b")),
            StageDef("b", b, deps=("a",)),
            StageDef("a", a),
        ],
        ctx=None,
    )
    assert out == {"a": 1, "b": 2, "c": 3}
    assert calls.index("a") < calls.index("b") < calls.index("c")
    state = json.loads((tmp_path / "pipestance.json").read_text())
    assert state["stages"]["c"]["status"] == "complete"


def test_chunked_split_join(tmp_path):
    def split(ctx, done):
        return [{"x": i} for i in range(5)]

    def join(ctx, results):
        return sum(results)

    orch = Orchestrator(tmp_path)
    out = orch.run(
        [StageDef("sq", _chunk_square, split=split, join=join)], ctx=None
    )
    assert out["sq"] == 0 + 1 + 4 + 9 + 16
    state = json.loads((tmp_path / "pipestance.json").read_text())
    assert state["stages"]["sq"]["chunks"] == 5


def test_chunked_process_pool(tmp_path):
    def split(ctx, done):
        return [{"x": i} for i in range(4)]

    orch = Orchestrator(tmp_path, processes=2)
    out = orch.run(
        [StageDef("sq", _chunk_square, split=split, join=None)], ctx=None
    )
    assert sorted(out["sq"]) == [0, 1, 4, 9]


def test_retry_then_success(tmp_path):
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("transient")
        return "ok"

    orch = Orchestrator(tmp_path)
    assert orch.run_stage("flaky", flaky, max_retries=2) == "ok"
    assert len(attempts) == 3
    assert orch.stage_state("flaky").attempts == 3


def test_failure_exhausts_retries(tmp_path):
    def broken():
        raise ValueError("nope")

    orch = Orchestrator(tmp_path)
    with pytest.raises(StageError, match="stage broken: ValueError"):
        orch.run_stage("broken", broken, max_retries=1)
    st = json.loads((tmp_path / "pipestance.json").read_text())["stages"]["broken"]
    assert st["status"] == "failed" and st["attempts"] == 2


def test_restore_skips_completed(tmp_path):
    orch = Orchestrator(tmp_path)
    assert orch.run_stage("s", lambda: 41) == 41

    # new orchestrator over the same pipestance: restore wins, fn not called
    orch2 = Orchestrator(tmp_path)
    def boom():
        raise AssertionError("must not rerun")

    assert orch2.run_stage("s", boom, restore=lambda: 42) == 42
    # without restore, a complete stage reruns (results are in-memory)
    assert orch2.run_stage("s", lambda: 43) == 43


def test_unknown_dep_rejected(tmp_path):
    orch = Orchestrator(tmp_path)
    with pytest.raises(ValueError, match="unknown dep"):
        orch.run([StageDef("x", lambda c, d: 0, deps=("ghost",))], ctx=None)
