"""The bench capture pipeline must survive a wedged TPU tunnel.

Round 3 lost its entire perf capture to one environment wedge (BENCH_r03
rc=1: `jax.devices()` hung; the headline JSON printed only after ~8 measured
surfaces).  These tests pin the resilience contract of `bench.py`:

  * the backend is probed in a SUBPROCESS with retry/backoff inside a total
    budget — a wedged grant can never hang the bench process itself;
  * the headline JSON line prints immediately after the RTF measurement
    (capture-first), and is re-printed with the full extras at the end;
  * secondary sections respect a soft wall-clock budget (skipped, recorded)
    instead of running the capture off the driver's cliff.
"""

import importlib.util
import io
import json
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_succeeds_first_probe(bench, monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_probe_backend", lambda: calls.append(1) or True)
    assert bench._wait_for_backend() is True
    assert len(calls) == 1


def test_wait_for_backend_retries_then_gives_up(bench, monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_probe_backend", lambda: calls.append(1) and False)
    monkeypatch.setattr(bench, "PROBE_BACKOFF_S", 0)
    monkeypatch.setattr(bench, "PROBE_BUDGET_S", 0)
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    assert bench._wait_for_backend() is False
    assert len(calls) >= 1


def test_wait_for_backend_recovers_after_wedge(bench, monkeypatch):
    answers = iter([False, False, True])
    monkeypatch.setattr(bench, "_probe_backend", lambda: next(answers))
    monkeypatch.setattr(bench, "PROBE_BACKOFF_S", 0)
    monkeypatch.setattr(bench, "PROBE_BUDGET_S", 3600)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_backend() is True


def test_main_exits_nonzero_when_backend_never_answers(bench, monkeypatch):
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: False)
    assert bench.main() == 1


def _stub_sections(bench, monkeypatch, rtf=1000.0):
    """Stub every measured surface so main() exercises only the pipeline.

    The flagship tail (robust + pretrain) runs in a CHILD process
    (`_run_tail_subprocess`); its `subprocess.run` is faked with tagged
    stdout lines so the real merge code runs without spawning anything."""
    import subprocess as _sp

    import gsoc_wav2vec2_tpu.models.modeling as modeling

    monkeypatch.setattr(bench, "_wait_for_backend", lambda: True)
    monkeypatch.setattr(
        modeling, "init_wav2vec2_for_ctc_params", lambda rng, cfg: {}
    )
    monkeypatch.setattr(
        bench,
        "_bench_inference",
        lambda c, p: (
            rtf,
            {
                "rtf_trials": 5,
                "rtf_min": rtf - 5.0,
                "rtf_max": rtf + 5.0,
                "rtf_stdev": 2.0,
                "inference_mfu": 0.5,
            },
        ),
    )
    # tests control the regression comparison explicitly
    monkeypatch.setattr(bench, "_prev_bench", lambda: None)
    monkeypatch.setattr(bench, "_bench_export", lambda c, p: (4.0, 5.0))
    monkeypatch.setattr(bench, "_bench_train_step", lambda c, p: (240.0, p))
    monkeypatch.setattr(bench, "_bench_grad_accum", lambda c, p: (1900.0, p))
    monkeypatch.setattr(
        bench,
        "_bench_serve",
        lambda c, p: {
            "serve_p50_ms": 60.0,
            "serve_p99_ms": 120.0,
            "serve_audio_sec_per_s": 900.0,
            "serve_batch_occupancy": 3.5,
            "serve_batch1_audio_sec_per_s": 300.0,
            "serve_batching_speedup": 3.0,
        },
    )

    def fake_run(cmd, **kw):
        assert "--section" in cmd and "tail" in cmd
        out = "\n".join(
            bench.SECTION_TAG + json.dumps(d)
            for d in [
                {
                    "robust_rtf_b8": 2700.0,
                    "robust_train_ms_per_step_b8_246k_remat": 170.0,
                },
                {
                    "pretrain_ms_per_step_b8_246k_remat": 90.0,
                    "pretrain_mfu": 0.334,
                },
                {"pretrain_robust_ms_per_step_b8_246k_remat": 229.0},
            ]
        )
        return _sp.CompletedProcess(cmd, 0, stdout=out, stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)


def test_main_prints_headline_first_then_full_record(bench, monkeypatch):
    _stub_sections(bench, monkeypatch)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bench.main() == 0
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert len(lines) == 2, lines
    first, last = json.loads(lines[0]), json.loads(lines[1])
    # capture-first: the headline metric is complete in line 1
    assert first["metric"] == "inference_rtf_base_bf16_b16"
    assert first["value"] == 1000.0
    assert first["vs_baseline"] > 0
    assert "partial" in first["extra"]
    # the final line carries every secondary number
    e = last["extra"]
    assert e["train_ms_per_step_b32_246k_remat"] == 240.0
    assert e["train_mfu"] > 0
    assert e["pretrain_ms_per_step_b8_246k_remat"] == 90.0
    assert e["pretrain_mfu"] > 0
    assert e["robust_rtf_b8"] == 2700.0
    assert e["serve_p99_ms"] == 120.0
    assert e["serve_batching_speedup"] == 3.0
    assert "bench_wall_s" in e


def test_tail_sections_emit_incrementally_and_survive_crashes(bench, monkeypatch):
    """Each tail measurement prints its own tagged line the moment it
    lands, and a crash in one section cannot forfeit the others."""
    monkeypatch.setattr(bench, "_bench_robust", lambda: (2700.0, 170.0))

    def boom(robust=False):
        if robust:
            raise RuntimeError("robust pretrain died")
        return 90.0

    monkeypatch.setattr(bench, "_bench_pretrain_step", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._tail_sections()
    merged = {}
    for line in buf.getvalue().splitlines():
        assert line.startswith(bench.SECTION_TAG)
        merged.update(json.loads(line[len(bench.SECTION_TAG):]))
    assert merged["robust_rtf_b8"] == 2700.0
    assert merged["pretrain_ms_per_step_b8_246k_remat"] == 90.0
    assert merged["pretrain_mfu"] > 0
    assert "robust pretrain died" in merged["pretrain_robust_error"]


def test_tail_subprocess_timeout_keeps_partial_lines(bench, monkeypatch):
    """A child that hangs after printing some results loses only the
    unfinished sections."""
    import subprocess as _sp

    partial = bench.SECTION_TAG + json.dumps({"robust_rtf_b8": 2650.0})

    def fake_run(cmd, timeout=None, **kw):
        raise _sp.TimeoutExpired(cmd, timeout, output=partial.encode())

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    extra = {}
    bench._run_tail_subprocess(extra, timeout_s=5.0)
    assert extra["robust_rtf_b8"] == 2650.0
    assert "timeout" in extra["tail_error"]


def test_tail_subprocess_records_child_failure_rc(bench, monkeypatch):
    import subprocess as _sp

    def fake_run(cmd, **kw):
        return _sp.CompletedProcess(cmd, 1, stdout="", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    extra = {}
    bench._run_tail_subprocess(extra, timeout_s=5.0)
    assert extra["tail_rc"] == 1


def test_main_headline_survives_secondary_hang_analog(bench, monkeypatch):
    """A secondary section raising (the exception analog of a hang the
    budget guard converts into) must not lose the already-printed
    headline."""
    _stub_sections(bench, monkeypatch)

    def boom(c, p):
        raise RuntimeError("tunnel wedged mid-run")

    monkeypatch.setattr(bench, "_bench_train_step", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bench.main() == 0
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert json.loads(lines[0])["value"] == 1000.0
    assert "train_error" in json.loads(lines[-1])["extra"]


def test_main_budget_skips_late_sections(bench, monkeypatch):
    _stub_sections(bench, monkeypatch)
    monkeypatch.setattr(bench, "BENCH_BUDGET_S", -1)  # everything is late
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bench.main() == 0
    e = json.loads(buf.getvalue().splitlines()[-1])["extra"]
    for section in ("train", "accum", "serve", "tail"):
        assert "time budget" in e[f"{section}_skipped"]
    assert "train_ms_per_step_b32_246k_remat" not in e


def test_main_regression_tripwire_fires(bench, monkeypatch, capsys):
    """A headline >3% below the newest BENCH_r*.json must set the
    `regression` flag, record the signed delta, and yell on stderr."""
    _stub_sections(bench, monkeypatch, rtf=1000.0)
    monkeypatch.setattr(bench, "_prev_bench", lambda: (4, 2000.0))
    assert bench.main() == 0
    out, err = capsys.readouterr()
    last = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert last["extra"]["rtf_vs_r04_pct"] == -50.0
    assert last["extra"]["regression"] is True
    assert "REGRESSION" in err


def test_main_regression_tripwire_quiet_within_noise(bench, monkeypatch, capsys):
    """A drop inside the tripwire records the delta but does not flag."""
    _stub_sections(bench, monkeypatch, rtf=1000.0)
    monkeypatch.setattr(bench, "_prev_bench", lambda: (4, 1010.0))
    assert bench.main() == 0
    out, err = capsys.readouterr()
    last = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert last["extra"]["rtf_vs_r04_pct"] == -1.0
    assert "regression" not in last["extra"]
    assert "REGRESSION" not in err


def test_main_extras_carry_dispersion_and_inference_mfu(bench, monkeypatch):
    """Both headline prints must carry the trial stats and inference_mfu."""
    _stub_sections(bench, monkeypatch, rtf=1000.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bench.main() == 0
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    for line in lines:
        e = json.loads(line)["extra"]
        assert e["rtf_trials"] == 5
        assert e["rtf_min"] == 995.0
        assert e["rtf_max"] == 1005.0
        assert e["rtf_stdev"] == 2.0
        assert e["inference_mfu"] == 0.5


def test_prev_bench_reads_newest_parsed_value(bench, tmp_path):
    """`_prev_bench` picks the highest round whose artifact parsed."""
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": {"value": 7087.0}})
    )
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"value": 7014.17}})
    )
    (tmp_path / "BENCH_r05.json").write_text("{not json")  # unreadable
    assert bench._prev_bench(str(tmp_path)) == (4, 7014.17)
    assert bench._prev_bench(str(tmp_path / "empty-missing")) is None


def test_pretrain_flops_model_is_sane(bench):
    """The pretraining step must cost MORE analytic FLOPs than the frozen
    fine-tuning step at the same shape (everything trains + quantizer +
    contrastive heads) — the MFU denominators must reflect that."""
    from gsoc_wav2vec2_tpu import Wav2Vec2Config

    ft = bench._train_step_flops(Wav2Vec2Config(), 8, 246000)
    pt = bench._pretrain_step_flops(8, 246000)
    assert pt > ft
    assert pt < 10 * ft  # same backbone: not orders of magnitude apart
