"""Self-supervised pretraining (`models/pretraining.py`) — oracle parity
against `transformers.Wav2Vec2ForPreTraining` (the torch implementation
that produced the checkpoints the reference fine-tunes from), plus
device-side negative-sampler properties and an end-to-end learn test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import requires_transformers, tiny_pretraining_config

from gsoc_wav2vec2_tpu.models.pretraining import (
    init_wav2vec2_for_pretraining_params,
    make_pretrain_step,
    pretraining_loss,
    sample_negative_indices,
    wav2vec2_for_pretraining_forward,
)


def _speech(batch, seqlen, seed=0):
    return np.asarray(
        np.random.default_rng(seed).standard_normal((batch, seqlen)), np.float32
    )


def _hf_mask_and_negatives(config, b, frames, seed=0):
    from transformers.models.wav2vec2.modeling_wav2vec2 import (
        _compute_mask_indices,
        _sample_negative_indices,
    )

    np.random.seed(seed)
    mask = _compute_mask_indices((b, frames), mask_prob=0.5, mask_length=2)
    negs = _sample_negative_indices(
        (b, frames), config.num_negatives, mask_time_indices=mask
    )
    return mask.astype(bool), negs.astype(np.int32)


@requires_transformers
@pytest.mark.parametrize("robust", [False, True])
def test_pretraining_forward_and_loss_match_hf_oracle(robust):
    """Eval-mode (deterministic argmax quantizer, no dropout) forward +
    full loss vs the live HF torch model with identical weights, mask and
    negatives — both the base (post-norm/group) and robust (pre-norm/
    layer-norm, the large/XLSR pretraining geometry) families."""
    import torch
    import transformers

    from tests.utils import matching_hf_config

    from gsoc_wav2vec2_tpu.convert.torch_to_jax import (
        pretraining_params_from_hf_model,
    )

    config = tiny_pretraining_config(robust=robust)
    hf_config = matching_hf_config(config)
    # pretraining REQUIRES the mask fill (HF gates `_mask_hidden_states`
    # behind apply_spec_augment, which the fine-tune parity helper disables)
    hf_config.apply_spec_augment = True  # and mask_time_prob > 0 so the
    # masked_spec_embed parameter exists; explicit indices take priority
    hf = transformers.Wav2Vec2ForPreTraining(hf_config).eval()
    params = pretraining_params_from_hf_model(hf, config)

    b, l = 2, 3200
    speech = _speech(b, l, seed=1)
    frames = config.conv_output_length(l)
    mask, negs = _hf_mask_and_negatives(config, b, frames, seed=3)

    with torch.no_grad():
        out = hf(
            torch.tensor(speech),
            mask_time_indices=torch.tensor(mask),
            sampled_negative_indices=torch.tensor(negs.astype(np.int64)),
        )

    states, quantized, perplexity = wav2vec2_for_pretraining_forward(
        params, config, jnp.asarray(speech), jnp.asarray(mask),
        training=False, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(states), out.projected_states.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(quantized), out.projected_quantized_states.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        float(perplexity), float(out.codevector_perplexity), rtol=1e-5
    )

    parts = pretraining_loss(
        states, quantized, perplexity, jnp.asarray(mask), jnp.asarray(negs),
        config,
    )
    np.testing.assert_allclose(
        float(parts["contrastive_loss"]), float(out.contrastive_loss),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(parts["diversity_loss"]), float(out.diversity_loss), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(parts["loss"]), float(out.loss), rtol=2e-4
    )

    # the hot path's id-based neg_is_pos must agree exactly with the
    # vector-equality fallback (tiny codebook -> id collisions are common
    # here, so this genuinely exercises the -inf masking)
    *_, code_ids = wav2vec2_for_pretraining_forward(
        params, config, jnp.asarray(speech), jnp.asarray(mask),
        training=False, compute_dtype=jnp.float32, return_code_ids=True,
    )
    parts_ids = pretraining_loss(
        states, quantized, perplexity, jnp.asarray(mask), jnp.asarray(negs),
        config, code_ids=code_ids, contrastive_impl="gather",
    )
    np.testing.assert_array_equal(
        np.asarray(parts_ids["contrastive_loss"]),
        np.asarray(parts["contrastive_loss"]),
    )

    # the production "gram" formulation (auto with code_ids) against the
    # HF oracle directly — same tolerance as the gather path
    parts_gram = pretraining_loss(
        states, quantized, perplexity, jnp.asarray(mask), jnp.asarray(negs),
        config, code_ids=code_ids,
    )
    np.testing.assert_allclose(
        float(parts_gram["contrastive_loss"]), float(out.contrastive_loss),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(parts_gram["loss"]), float(out.loss), rtol=2e-4
    )


def test_sample_negative_indices_properties():
    """Device sampler: every negative of a masked frame points at ANOTHER
    masked frame of the same utterance; coverage is near-uniform."""
    rng = np.random.default_rng(0)
    b, l, k = 3, 64, 20
    mask = rng.random((b, l)) < 0.4
    mask[:, :2] = True  # ensure >=2 masked per row
    negs = np.asarray(
        sample_negative_indices(jax.random.PRNGKey(0), jnp.asarray(mask), k)
    )
    assert negs.shape == (b, l, k)
    for bi in range(b):
        masked_pos = set(np.flatnonzero(mask[bi]))
        for li in np.flatnonzero(mask[bi]):
            row = negs[bi, li] - bi * l
            assert (row >= 0).all() and (row < l).all()
            assert li not in row, "sampled the positive itself"
            assert set(row.tolist()) <= masked_pos, "negative not masked"
    # coverage: with 20 draws x many rows, most other masked positions appear
    bi = 0
    seen = set()
    for li in np.flatnonzero(mask[bi]):
        seen |= set((negs[bi, li] - bi * l).tolist())
    assert len(seen) >= 0.8 * mask[bi].sum()


def test_gumbel_straight_through_gradients():
    """Training-mode quantizer: the forward output is built from HARD
    one-hots, yet gradients reach both weight_proj and the codevectors."""
    from gsoc_wav2vec2_tpu.models.pretraining import gumbel_vector_quantizer

    config = tiny_pretraining_config()
    rng = jax.random.PRNGKey(0)
    params = init_wav2vec2_for_pretraining_params(rng, config)["quantizer"]
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 9, 32)), jnp.float32
    )

    def f(p):
        q, _, _ = gumbel_vector_quantizer(
            p, config, feats, None, temperature=2.0, training=True,
            rng=jax.random.PRNGKey(7),
        )
        return jnp.sum(q * q)

    grads = jax.grad(f)(params)
    assert float(jnp.abs(grads["weight_proj"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["codevectors"]).sum()) > 0

    # hard forward: each group output must equal SOME codevector exactly
    q, _, ids = gumbel_vector_quantizer(
        params, config, feats, None, temperature=2.0, training=True,
        rng=jax.random.PRNGKey(7),
    )
    g = config.num_codevector_groups
    d_g = config.codevector_dim // g
    qg = np.asarray(q).reshape(-1, g, d_g)
    cb = np.asarray(params["codevectors"]).reshape(g, -1, d_g)
    ids_flat = np.asarray(ids).reshape(-1, g)
    for gi in range(g):
        dists = np.abs(qg[:, gi, None, :] - cb[None, gi]).max(-1).min(-1)
        assert dists.max() < 1e-5
        # the returned ids name the codevector each output matches (up to
        # the straight-through term's fp residue, (hard + soft) - soft)
        np.testing.assert_allclose(
            cb[gi, ids_flat[:, gi]], qg[:, gi], atol=1e-5
        )


@pytest.mark.slow
def test_pretrain_cli_end_to_end(tmp_path):
    """`cli.pretrain` subprocess on a synthetic corpus (8 virtual CPU
    devices): finite losses logged, Orbax checkpoint written, and the
    exported backbone loads straight into `Wav2Vec2ForCTC.from_pretrained`
    (the fine-tuning entry: the full lifecycle link)."""
    import json
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    rng = np.random.default_rng(3)
    chap = tmp_path / "corpus" / "1" / "1"
    chap.mkdir(parents=True)
    lines = []
    for i in range(8):  # global batch = 8 virtual devices x 1
        sig = np.clip(
            2000 * np.sin(np.arange(6000) / 5.0)
            + rng.integers(-60, 60, 6000),
            -32768, 32767,
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} UNUSED TEXT")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    config = tiny_pretraining_config(num_layers=1)
    cfg_dir = tmp_path / "cfg"
    config.save_pretrained(str(cfg_dir))

    ckpt_dir = str(tmp_path / "ckpts")
    log_dir = str(tmp_path / "logs")
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.pretrain",
            "--train_dir", str(tmp_path / "corpus"),
            "--config", str(cfg_dir / "config.json"),
            "--epochs", "2", "--batch_size_per_device", "1",
            # data axis 4 -> global batch 4, x2 accumulation = one optimizer
            # update per epoch over all 8 samples: drives the pretraining
            # accumulate/apply path through the full driver
            "--model_axis", "2", "--grad_accum", "2",
            "--audio_maxlen", "6000", "--mask_time_length", "2",
            "--warmup_steps", "4", "--lr", "1e-4",
            "--ema_decay", "0.5",
            "--logging_steps", "1", "--compute_dtype", "float32",
            "--ckpt_dir", ckpt_dir, "--log_dir", log_dir,
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    metrics = [
        json.loads(line)
        for line in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    losses = [m["pretrain/loss"] for m in metrics if "pretrain/loss" in m]
    assert losses and all(np.isfinite(losses))
    temps = [
        m["pretrain/gumbel_temperature"] for m in metrics
        if "pretrain/gumbel_temperature" in m
    ]
    assert temps[0] <= 2.0 and temps[-1] <= temps[0]
    assert os.path.isdir(os.path.join(ckpt_dir, "pretrain"))

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    ctc = Wav2Vec2ForCTC.from_pretrained(os.path.join(ckpt_dir, "for_ctc"))
    out = ctc(np.zeros((1, 6000), np.float32))
    assert np.isfinite(np.asarray(out)).all()

    # --ema_decay also exports the EMA backbone: same fresh CTC head (same
    # init rng), different (averaged) backbone weights
    ema = Wav2Vec2ForCTC.from_pretrained(os.path.join(ckpt_dir, "for_ctc_ema"))
    np.testing.assert_array_equal(
        np.asarray(ema.params["lm_head"]["kernel"]),
        np.asarray(ctc.params["lm_head"]["kernel"]),
    )
    backbone_diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(ema.params["wav2vec2"]),
            jax.tree.leaves(ctc.params["wav2vec2"]),
        )
    ]
    assert max(backbone_diffs) > 0
    assert np.isfinite(np.asarray(ema(np.zeros((1, 6000), np.float32)))).all()


@pytest.mark.slow
def test_pretrain_cli_tfrecords_and_resume_refusal(tmp_path):
    """Two regressions: (1) tfrecord input used to crash on the unknowable
    stream length (num_batches None * epochs); (2) --resume pointing at a
    dir with no checkpoint must refuse loudly, not silently restart."""
    import os
    import subprocess
    import sys

    from gsoc_wav2vec2_tpu.data.native_io import TFRecordWriter

    rng = np.random.default_rng(7)
    shard = str(tmp_path / "train-0.tfrecord")
    with TFRecordWriter(shard) as w:
        for _ in range(8):
            w.write(
                rng.standard_normal(6000).astype(np.float32),
                np.asarray([5, 6, 7], np.int32),
            )

    config = tiny_pretraining_config(num_layers=1)
    cfg_dir = tmp_path / "cfg"
    config.save_pretrained(str(cfg_dir))
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    base_args = [
        sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.pretrain",
        "--train_tfrecords", shard,
        "--config", str(cfg_dir / "config.json"),
        "--epochs", "1", "--batch_size_per_device", "1",
        "--audio_maxlen", "6000", "--mask_time_length", "2",
        "--warmup_steps", "2", "--lr", "1e-4", "--logging_steps", "1",
        "--compute_dtype", "float32",
        "--ckpt_dir", str(tmp_path / "ckpts"), "--log_dir", str(tmp_path / "logs"),
    ]
    result = subprocess.run(base_args, capture_output=True, text=True,
                            env=env, cwd="/root/repo", timeout=900)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "tfrecord stream length unknown" in result.stdout

    empty = str(tmp_path / "nothing_here")
    os.makedirs(empty)
    result = subprocess.run(
        base_args + ["--resume", empty], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=900,
    )
    assert result.returncode != 0
    assert "refusing to silently restart" in result.stderr


@pytest.mark.slow
def test_pretrain_cli_sigterm_preemption(tmp_path):
    """SIGTERM during pretraining saves a step-granular checkpoint and
    exits cleanly; --resume picks it up mid-epoch and completes (the
    bit-exactness of the shared mechanism is pinned by the train-CLI
    test — `cli.pretrain` imports the same helpers)."""
    import os
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    rng = np.random.default_rng(13)
    chap = tmp_path / "corpus" / "1" / "1"
    chap.mkdir(parents=True)
    lines = []
    for i in range(8):
        sig = np.clip(
            2000 * np.sin(np.arange(6000) / 5.0)
            + rng.integers(-60, 60, 6000),
            -32768, 32767,
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} UNUSED")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    config = tiny_pretraining_config(num_layers=1)
    cfg_dir = tmp_path / "cfg"
    config.save_pretrained(str(cfg_dir))
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    ckpt_dir = str(tmp_path / "ckpts")
    log_dir = str(tmp_path / "logs")
    argv = [
        sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.pretrain",
        "--train_dir", str(tmp_path / "corpus"),
        "--config", str(cfg_dir / "config.json"),
        "--epochs", "10", "--batch_size_per_device", "1",
        "--model_axis", "4",  # global batch 2 -> 4 updates per epoch
        "--audio_maxlen", "6000", "--mask_time_length", "2",
        "--warmup_steps", "4", "--lr", "1e-4", "--logging_steps", "1",
        "--compute_dtype", "float32",
        "--ckpt_dir", ckpt_dir, "--log_dir", log_dir,
    ]
    out_path = str(tmp_path / "stdout.txt")
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            argv, stdout=out, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        metrics_path = os.path.join(log_dir, "metrics.jsonl")
        deadline = _time.time() + 600
        seen = 0
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "pretraining finished before the signal: "
                    + open(out_path).read()[-3000:]
                )
            if os.path.exists(metrics_path):
                with open(metrics_path) as f:
                    seen = sum(1 for line in f if "pretrain/loss" in line)
                if seen >= 2:
                    break
            _time.sleep(0.2)
        assert seen >= 2, "pretraining never produced loss logs"
        proc.send_signal(_signal.SIGTERM)
        proc.wait(timeout=300)
    stdout = open(out_path).read()
    assert proc.returncode == 0, stdout[-3000:]
    assert "preempted — saved epoch" in stdout, stdout[-3000:]

    resumed = subprocess.run(
        argv + ["--resume", ckpt_dir, "--epochs", "3"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900,
    )
    assert resumed.returncode == 0, resumed.stderr[-3000:]
    assert "resumed epoch" in resumed.stdout
    assert os.path.isdir(os.path.join(ckpt_dir, "for_ctc"))


@pytest.mark.slow
def test_pretrain_step_on_mesh_matches_single_device():
    """The sharded pretrain step (4x2 data×model mesh over 8 virtual CPU
    devices) computes the same objective as the unsharded step.  The
    continuous pieces (perplexity, diversity) must agree tightly; the
    contrastive term is allowed ~2%: the Gumbel-argmax code picks are
    DISCRETE, and resharding reorders float ops enough to flip near-tie
    argmaxes, which swaps a few positive targets (measured: forward-only
    is bit-stable at 2e-6; only the joint fwd+bwd program flips picks)."""
    import optax

    from gsoc_wav2vec2_tpu.parallel import make_mesh, replicated, shard_params
    from gsoc_wav2vec2_tpu.ops.specaugment import compute_mask_indices
    from gsoc_wav2vec2_tpu.training.state import TrainState

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    config = tiny_pretraining_config(num_layers=1)
    params = init_wav2vec2_for_pretraining_params(jax.random.PRNGKey(0), config)
    tx = optax.adam(1e-4)
    b, l = 8, 3200
    frames = int(config.conv_output_length(l))
    batch = {
        "speech": jnp.asarray(_speech(b, l, seed=4)),
        "mask_time_indices": compute_mask_indices(
            jax.random.PRNGKey(11), b, frames, 0.5, 2
        ),
    }
    rng = jax.random.PRNGKey(1)

    def run(mesh):
        # fresh copy per run: the step donates its state buffers
        p = jax.tree.map(jnp.array, params)
        p = shard_params(p, mesh) if mesh else p
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=jax.jit(tx.init)(p),
        )
        if mesh:
            state = TrainState(
                step=jax.device_put(state.step, replicated(mesh)),
                params=state.params, opt_state=state.opt_state,
            )
        step = make_pretrain_step(
            config, tx, division_factor=b, compute_dtype=jnp.float32,
            remat=False, mesh=mesh,
        )
        db = batch
        if mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            db = {
                "speech": jax.device_put(
                    batch["speech"], NamedSharding(mesh, P("data"))
                ),
                "mask_time_indices": jax.device_put(
                    batch["mask_time_indices"], NamedSharding(mesh, P("data"))
                ),
            }
        _, metrics = step(state, db, rng, jnp.float32(2.0))
        return {k: float(v) for k, v in metrics.items()}

    single = run(None)
    sharded = run(make_mesh(model=2))
    np.testing.assert_allclose(
        sharded["codevector_perplexity"], single["codevector_perplexity"],
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        sharded["diversity_loss"], single["diversity_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(sharded["loss"], single["loss"], rtol=2e-2)


@pytest.mark.slow
def test_pretrain_grad_accum_linearity_and_learning():
    """Gradient-accumulation correctness for pretraining.  Unlike the CTC
    path there is no big-batch bit-equality to pin against (Gumbel noise and
    negative draws key off each microbatch's rng), so assert what IS exact:
    (a) accumulating the same microbatch at the same micro index twice gives
    exactly 2x the gradients and loss parts (f32 x+x is exact), and (b) the
    accumulate/apply path optimizes — contrastive loss drops on fixed data."""
    import optax

    from gsoc_wav2vec2_tpu.models.pretraining import make_pretrain_accum_steps
    from gsoc_wav2vec2_tpu.ops.specaugment import compute_mask_indices
    from gsoc_wav2vec2_tpu.training.state import TrainState

    config = tiny_pretraining_config(num_layers=1)
    params = init_wav2vec2_for_pretraining_params(jax.random.PRNGKey(0), config)
    tx = optax.adam(3e-4)
    b, l = 2, 3200
    frames = int(config.conv_output_length(l))
    micros = []
    for s in (2, 3):
        micros.append({
            "speech": jnp.asarray(_speech(b, l, seed=s)),
            "mask_time_indices": compute_mask_indices(
                jax.random.PRNGKey(s), b, frames, 0.5, 2, min_masks=2
            ),
        })
    init_fn, accum_fn, apply_fn = make_pretrain_accum_steps(
        config, tx, division_factor=2 * b, compute_dtype=jnp.float32,
        remat=False,
    )
    rng = jax.random.PRNGKey(9)
    step0 = jnp.zeros((), jnp.int32)
    temp = jnp.float32(2.0)

    # (a) exact linearity of the accumulator
    g, m = init_fn(params)
    g, m = accum_fn(params, micros[0], rng, step0, jnp.int32(0), temp, g, m)
    g_snap = jax.tree.map(np.asarray, g)
    loss1 = float(m["loss"])
    contrastive1 = float(m["contrastive_loss"])
    g, m = accum_fn(params, micros[0], rng, step0, jnp.int32(0), temp, g, m)
    for a, b_leaf in zip(
        jax.tree_util.tree_leaves(g_snap), jax.tree_util.tree_leaves(g)
    ):
        np.testing.assert_array_equal(2.0 * a, np.asarray(b_leaf))
    assert float(m["loss"]) == 2.0 * loss1
    assert float(m["contrastive_loss"]) == 2.0 * contrastive1

    # (b) the accumulated update optimizes the objective
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    first = last = None
    for _ in range(25):
        g, m = init_fn(state.params)
        for j, mb in enumerate(micros):
            g, m = accum_fn(state.params, mb, rng, state.step, jnp.int32(j),
                            temp, g, m)
        state, metrics = apply_fn(state, g, m)
        last = float(metrics["contrastive_loss"])
        if first is None:
            first = last
        assert np.isfinite(last)
        assert np.isfinite(float(metrics["grad_norm"]))
    assert last < first * 0.9, (first, last)


def test_pretrain_step_learns_and_temperature_is_traced():
    """A few optimizer steps on fixed data reduce the contrastive loss;
    changing the Gumbel temperature does NOT recompile (traced scalar)."""
    import optax

    from gsoc_wav2vec2_tpu.models.pretraining import (
        init_wav2vec2_for_pretraining_params,
    )
    from gsoc_wav2vec2_tpu.ops.specaugment import compute_mask_indices
    from gsoc_wav2vec2_tpu.training.state import TrainState

    config = tiny_pretraining_config(num_layers=1)
    params = init_wav2vec2_for_pretraining_params(jax.random.PRNGKey(0), config)
    tx = optax.adam(3e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    b, l = 2, 3200
    frames = int(config.conv_output_length(l))
    mti = compute_mask_indices(
        jax.random.PRNGKey(5), b, frames, 0.5, 2, min_masks=2
    )
    batch = {
        "speech": jnp.asarray(_speech(b, l, seed=2)),
        "mask_time_indices": mti,
    }
    step = make_pretrain_step(
        config, tx, division_factor=b, compute_dtype=jnp.float32, remat=False
    )
    rng = jax.random.PRNGKey(9)

    temps = np.linspace(2.0, 1.0, 30, dtype=np.float32)
    first = None
    for i, t in enumerate(temps):
        state, metrics = step(state, batch, rng, jnp.float32(t))
        if i == 0:
            first = float(metrics["contrastive_loss"])
    last = float(metrics["contrastive_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.9, (first, last)
    assert step._cache_size() == 1, "temperature change recompiled the step"


def test_scatter_rows_add_matches_xla_scatter():
    """The one-hot-matmul scatter kernel (`ops/pallas/scatter_add.py`) must
    equal XLA's scatter-add exactly for 0/1 selection x bf16-rounded
    addends — duplicate indices, non-CHUNK-multiple N, and all-same-index
    rows included."""
    import numpy as np

    from gsoc_wav2vec2_tpu.ops.pallas.scatter_add import (
        scatter_rows_add,
        supports,
    )

    assert supports(768, 256)
    rng = np.random.default_rng(0)
    b, n, d, l = 3, 1000, 128, 64  # N deliberately not a CHUNK multiple
    dneg = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, l, size=(b, n)).astype(np.int32))
    idx = idx.at[1].set(7)  # one row scatters everything onto index 7

    got = scatter_rows_add(dneg, idx, l_rows=l, interpret=True)

    # reference: XLA scatter-add of the bf16-rounded addends (the kernel's
    # dot rounds each addend to bf16 before f32 accumulation)
    dneg_r = dneg.astype(jnp.bfloat16).astype(jnp.float32)
    want = jnp.zeros((b, l, d), jnp.float32)
    for bi in range(b):
        want = want.at[bi].add(
            jnp.zeros((l, d), jnp.float32).at[idx[bi]].add(dneg_r[bi])
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


@pytest.mark.slow
def test_pretraining_loss_pallas_scatter_grad_matches_xla():
    """`pretraining_loss(pallas_scatter=True)` (interpret kernel) and the
    XLA scatter path must give the same loss AND the same gradients w.r.t.
    the projected tensors (bf16-addend rounding tolerance)."""
    import numpy as np

    from gsoc_wav2vec2_tpu.models.pretraining import (
        pretraining_loss,
        sample_negative_indices,
    )

    config = tiny_pretraining_config()
    b, l, d = 2, 24, config.proj_codevector_dim
    rng = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    states = jax.random.normal(k1, (b, l, d), jnp.float32)
    quantized = jax.random.normal(k2, (b, l, d), jnp.float32)
    mti = jax.random.bernoulli(k3, 0.5, (b, l))
    negs = sample_negative_indices(k4, mti, config.num_negatives)
    perp = jnp.float32(5.0)

    def loss(states, quantized, pallas):
        # scatter_rows_add auto-interprets on the CPU backend
        parts = pretraining_loss(
            states, quantized, perp, mti, negs, config,
            pallas_scatter=pallas,
        )
        return parts["loss"]

    lx = float(loss(states, quantized, False))
    lp = float(loss(states, quantized, True))
    assert lx == lp  # forward identical (same gather)

    gx = jax.grad(loss, argnums=(0, 1))(states, quantized, False)
    gp = jax.grad(loss, argnums=(0, 1))(states, quantized, True)
    for a, w, name in zip(gp, gx, ("states", "quantized")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-2, atol=2e-3,
            err_msg=name,
        )


@pytest.mark.slow
def test_pretraining_loss_pallas_scatter_mesh_matches_xla():
    """Under a multi-device mesh the Pallas scatter VJP runs per-shard via
    `shard_map` over the data axis (the scatter is independent per batch
    row).  The mesh path must (a) be bit-close to the single-device Pallas
    path and (b) match the XLA scatter at bf16-addend rounding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gsoc_wav2vec2_tpu.parallel import make_mesh

    config = tiny_pretraining_config()
    b, l, d = 4, 24, config.proj_codevector_dim
    rng = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    states = jax.random.normal(k1, (b, l, d), jnp.float32)
    quantized = jax.random.normal(k2, (b, l, d), jnp.float32)
    mti = jax.random.bernoulli(k3, 0.5, (b, l))
    negs = sample_negative_indices(k4, mti, config.num_negatives)
    perp = jnp.float32(5.0)
    mesh = make_mesh(model=2)  # 4x2 over the 8 virtual CPU devices

    def loss(states, quantized, pallas, mesh=None):
        # scatter_rows_add auto-interprets on the CPU backend
        parts = pretraining_loss(
            states, quantized, perp, mti, negs, config,
            pallas_scatter=pallas, mesh=mesh,
        )
        return parts["loss"]

    sh = NamedSharding(mesh, P("data"))
    states_s = jax.device_put(states, sh)
    quantized_s = jax.device_put(quantized, sh)

    # forward is the same trace either way (the flag only swaps the VJP);
    # compare at the SAME sharded layout (resharding reorders the batch
    # reduction enough to move the last float bits)
    lx_sharded = float(loss(states_s, quantized_s, False))
    lm = float(loss(states_s, quantized_s, True, mesh))
    assert lx_sharded == lm

    gx = jax.grad(loss, argnums=(0, 1))(states, quantized, False)
    gp = jax.grad(loss, argnums=(0, 1))(states, quantized, True)
    gm = jax.grad(loss, argnums=(0, 1))(states_s, quantized_s, True, mesh)
    for a, w, name in zip(gm, gp, ("states", "quantized")):
        # same kernel per batch row; only sharded-layout reduction
        # reorder separates the paths
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-5, atol=1e-6,
            err_msg=f"mesh-vs-single pallas: {name}",
        )
    for a, w, name in zip(gm, gx, ("states", "quantized")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-2, atol=2e-3,
            err_msg=f"mesh pallas vs xla: {name}",
        )


def test_pretraining_loss_explicit_pallas_scatter_mesh_guards():
    """An explicit `pallas_scatter=True` under a multi-device mesh whose
    data axis does not divide the batch (or that lacks a data axis) must
    raise a clear ValueError instead of an opaque shard_map trace error."""
    import pytest
    from jax.sharding import Mesh

    from gsoc_wav2vec2_tpu.models.pretraining import (
        pretraining_loss,
        sample_negative_indices,
    )
    from gsoc_wav2vec2_tpu.parallel import make_mesh

    config = tiny_pretraining_config()
    b, l, d = 3, 24, config.proj_codevector_dim  # b=3 does not divide 4
    rng = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    states = jax.random.normal(k1, (b, l, d), jnp.float32)
    quantized = jax.random.normal(k2, (b, l, d), jnp.float32)
    mti = jax.random.bernoulli(k3, 0.5, (b, l))
    negs = sample_negative_indices(k4, mti, config.num_negatives)
    perp = jnp.float32(5.0)

    mesh = make_mesh(model=2)  # 4x2: data axis 4 does not divide b=3
    with pytest.raises(ValueError, match="divide the batch"):
        pretraining_loss(
            states, quantized, perp, mti, negs, config,
            pallas_scatter=True, mesh=mesh,
        )

    modelonly = Mesh(
        np.asarray(jax.devices()[:2]).reshape(2), ("model",)
    )  # no data axis at all
    with pytest.raises(ValueError, match="mesh axis"):
        pretraining_loss(
            states, quantized, perp, mti, negs, config,
            pallas_scatter=True, mesh=modelonly,
        )


def test_gram_formulation_matches_gather():
    """The round-5 "gram" contrastive formulation (Gram-matrix similarities
    + compare-select-reduce extraction, no gather/scatter) must match the
    gather formulation on loss AND input gradients; `auto` must pick gram
    exactly when code_ids are present and pallas_scatter was not forced."""
    from gsoc_wav2vec2_tpu.models.pretraining import (
        pretraining_loss,
        sample_negative_indices,
    )

    config = tiny_pretraining_config()
    b, l, d = 2, 48, config.proj_codevector_dim
    rng = jax.random.PRNGKey(21)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    states = jax.random.normal(k1, (b, l, d), jnp.float32)
    quantized = jax.random.normal(k2, (b, l, d), jnp.float32)
    mti = jax.random.bernoulli(k3, 0.5, (b, l))
    negs = sample_negative_indices(k4, mti, config.num_negatives)
    # tiny codebook -> real id collisions, exercising the -inf masking
    code_ids = jax.random.randint(
        k5, (b, l, config.num_codevector_groups), 0,
        config.num_codevectors_per_group,
    )
    perp = jnp.float32(5.0)

    def loss(states, quantized, impl):
        return pretraining_loss(
            states, quantized, perp, mti, negs, config,
            code_ids=code_ids, contrastive_impl=impl,
        )["loss"]

    l_gather = jax.jit(loss, static_argnums=2)(states, quantized, "gather")
    l_gram = jax.jit(loss, static_argnums=2)(states, quantized, "gram")
    l_auto = jax.jit(loss, static_argnums=2)(states, quantized, "auto")
    np.testing.assert_allclose(float(l_gram), float(l_gather), rtol=1e-5)
    # auto == gram bitwise (same program)
    np.testing.assert_array_equal(np.asarray(l_auto), np.asarray(l_gram))

    gg = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        states, quantized, "gram"
    )
    gx = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        states, quantized, "gather"
    )
    for a, w, name in zip(gg, gx, ("states", "quantized")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )

    # gram demands code_ids (vector-equality fallback needs gathered rows)
    with pytest.raises(ValueError, match="requires code_ids"):
        pretraining_loss(
            states, quantized, perp, mti, negs, config,
            contrastive_impl="gram",
        )
    # auto without code_ids falls back to gather (bitwise)
    l_auto_nocid = pretraining_loss(
        states, quantized, perp, mti, negs, config
    )["loss"]
    l_gather_nocid = pretraining_loss(
        states, quantized, perp, mti, negs, config,
        contrastive_impl="gather",
    )["loss"]
    np.testing.assert_array_equal(
        np.asarray(l_auto_nocid), np.asarray(l_gather_nocid)
    )


def test_gram_formulation_partitions_under_mesh():
    """The gram path is plain XLA ops — GSPMD must partition it under a
    data x model mesh with batch-sharded inputs, matching single-device
    results (no shard_map, no custom calls)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gsoc_wav2vec2_tpu.models.pretraining import (
        pretraining_loss,
        sample_negative_indices,
    )
    from gsoc_wav2vec2_tpu.parallel import make_mesh

    config = tiny_pretraining_config()
    b, l, d = 4, 32, config.proj_codevector_dim
    rng = jax.random.PRNGKey(31)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    states = jax.random.normal(k1, (b, l, d), jnp.float32)
    quantized = jax.random.normal(k2, (b, l, d), jnp.float32)
    mti = jax.random.bernoulli(k3, 0.5, (b, l))
    negs = sample_negative_indices(k4, mti, config.num_negatives)
    code_ids = jax.random.randint(
        k5, (b, l, config.num_codevector_groups), 0,
        config.num_codevectors_per_group,
    )
    perp = jnp.float32(5.0)

    def grads(states, quantized, mesh):
        def loss(s, q):
            return pretraining_loss(
                s, q, perp, mti, negs, config,
                code_ids=code_ids, contrastive_impl="gram", mesh=mesh,
            )["loss"]

        return jax.grad(loss, argnums=(0, 1))(states, quantized)

    ref = jax.jit(lambda s, q: grads(s, q, None))(states, quantized)

    mesh = make_mesh(model=2)  # data=4 x model=2
    shard = NamedSharding(mesh, P("data"))
    s_sh = jax.device_put(states, shard)
    q_sh = jax.device_put(quantized, shard)
    got = jax.jit(lambda s, q: grads(s, q, mesh))(s_sh, q_sh)
    for a, w, name in zip(got, ref, ("states", "quantized")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-5, atol=1e-6,
            err_msg=f"mesh gram vs single: {name}",
        )
