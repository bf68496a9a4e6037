"""Literal-ONNX export tests (reference `notebooks/wav2vec2_onnx.ipynb`).

The environment has neither the `onnx` package nor onnxruntime, so the
artifact is validated three independent ways:
  1. numerically — `export/onnx_numpy.py` (a from-scratch evaluator that
     re-parses the serialized bytes) reproduces the JAX forward's logits;
  2. structurally — protoc compiles the checked-in official schema subset
     (`export/onnx_subset.proto`) into google.protobuf bindings that parse
     the artifact field-for-field (validating the from-scratch wire codec
     against the official protobuf runtime);
  3. against an independent writer — torch's C++ ONNX exporter produces a
     tiny HF wav2vec2 artifact which our reader parses and our evaluator
     executes to torch-output parity (validating that the evaluator
     implements real ONNX op semantics, not a private dialect).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils import requires_transformers, tiny_config

from gsoc_wav2vec2_tpu.export import onnx_proto as P
from gsoc_wav2vec2_tpu.export.onnx_export import (
    IR_VERSION,
    OPSET_VERSION,
    export_onnx,
)
from gsoc_wav2vec2_tpu.export.onnx_numpy import OnnxModel
from gsoc_wav2vec2_tpu.models.modeling import (
    init_wav2vec2_for_ctc_params,
    wav2vec2_for_ctc_forward,
)

SEQLEN = 8000

requires_protoc = pytest.mark.skipif(
    shutil.which("protoc") is None, reason="requires protoc"
)


@pytest.fixture(scope="module")
def base_artifact(tmp_path_factory):
    cfg = tiny_config()
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), cfg)
    save_dir = str(tmp_path_factory.mktemp("onnx_base"))
    path = export_onnx(cfg, params, save_dir, seqlen=SEQLEN)
    return cfg, params, path


@pytest.fixture(scope="module")
def protoc_bindings(tmp_path_factory):
    """protoc-compiled google.protobuf bindings for the official schema."""
    out = str(tmp_path_factory.mktemp("pb"))
    proto_dir = os.path.join(
        os.path.dirname(__file__), "..", "gsoc_wav2vec2_tpu", "export"
    )
    subprocess.run(
        ["protoc", f"--python_out={out}", f"--proto_path={proto_dir}",
         "onnx_subset.proto"],
        check=True,
    )
    sys.path.insert(0, out)
    try:
        import onnx_subset_pb2
    finally:
        sys.path.remove(out)
    return onnx_subset_pb2


def test_numpy_eval_matches_jax_base(base_artifact):
    cfg, params, path = base_artifact
    model = OnnxModel(path)
    assert model.input_names == ["speech"]
    speech = np.random.RandomState(0).randn(2, SEQLEN).astype(np.float32)
    (got,) = model.run({"speech": speech})
    want = np.asarray(
        wav2vec2_for_ctc_forward(
            params, cfg, jnp.asarray(speech), training=False,
            compute_dtype=jnp.float32,
        )
    )
    assert got.shape == want.shape == (2, cfg.conv_output_length(SEQLEN), 32)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_numpy_eval_matches_jax_robust_with_ragged_mask(tmp_path):
    """Robust family: pre-norm layers, per-conv LayerNorm, and the
    sample->frame attention-mask arithmetic (reference `modeling.py:201-206`)
    all reproduced in-graph."""
    cfg = tiny_config(robust=True)
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(1), cfg)
    path = export_onnx(cfg, params, str(tmp_path), seqlen=SEQLEN)
    model = OnnxModel(path)
    assert model.input_names == ["speech", "attention_mask"]

    speech = np.random.RandomState(1).randn(2, SEQLEN).astype(np.float32)
    mask = np.zeros((2, SEQLEN), np.float32)
    mask[0, :] = 1.0
    mask[1, :5000] = 1.0
    (got,) = model.run({"speech": speech, "attention_mask": mask})
    want = np.asarray(
        wav2vec2_for_ctc_forward(
            params, cfg, jnp.asarray(speech), jnp.asarray(mask),
            training=False, compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_greedy_transcription_equality(base_artifact):
    """The artifact's argmax decode equals the JAX path's — the check the
    reference notebook ran on its ONNX export (string-level equivalence)."""
    cfg, params, path = base_artifact
    from gsoc_wav2vec2_tpu.data.processor import Wav2Vec2Processor

    tokenizer = Wav2Vec2Processor(is_tokenizer=True)
    speech = np.random.RandomState(7).randn(1, SEQLEN).astype(np.float32)
    (onnx_logits,) = OnnxModel(path).run({"speech": speech})
    jax_logits = np.asarray(
        wav2vec2_for_ctc_forward(
            params, cfg, jnp.asarray(speech), training=False,
            compute_dtype=jnp.float32,
        )
    )
    assert tokenizer.decode(np.argmax(onnx_logits[0], -1).tolist()) == (
        tokenizer.decode(np.argmax(jax_logits[0], -1).tolist())
    )


@requires_protoc
def test_artifact_parses_under_official_protoc_schema(base_artifact, protoc_bindings):
    _, _, path = base_artifact
    pb = protoc_bindings
    model = pb.ModelProto()
    with open(path, "rb") as f:
        model.ParseFromString(f.read())
    assert model.ir_version == IR_VERSION
    assert model.opset_import[0].version == OPSET_VERSION
    assert model.opset_import[0].domain == ""
    assert model.graph.input[0].name == "speech"
    dim = model.graph.input[0].type.tensor_type.shape.dim
    assert dim[0].dim_param == "batch" and dim[1].dim_value == SEQLEN
    assert model.graph.output[0].name == "logits"

    # graph is well-formed: topologically ordered, every input resolvable
    available = {t.name for t in model.graph.initializer}
    available.update(vi.name for vi in model.graph.input)
    for node in model.graph.node:
        for name in node.input:
            assert name in available, f"{node.op_type} input {name!r} undefined"
        available.update(node.output)
    assert "logits" in available


@requires_protoc
def test_reader_agrees_with_protoc_reader(base_artifact, protoc_bindings):
    """The from-scratch decoder and google.protobuf must see the same model."""
    _, _, path = base_artifact
    with open(path, "rb") as f:
        blob = f.read()
    pb_model = protoc_bindings.ModelProto()
    pb_model.ParseFromString(blob)
    ours = P.decode_model(blob)
    assert [n["op_type"] for n in ours["graph"]["node"]] == [
        n.op_type for n in pb_model.graph.node
    ]
    assert [t["name"] for t in ours["graph"]["initializer"]] == [
        t.name for t in pb_model.graph.initializer
    ]
    # spot-check tensor payload equality through both readers (all tensors:
    # same name, dims, dtype enum, and raw bytes)
    for ours_t, pb_t in zip(ours["graph"]["initializer"], pb_model.graph.initializer):
        assert ours_t["name"] == pb_t.name
        assert list(ours_t["dims"]) == list(pb_t.dims)
        assert ours_t["data_type"] == pb_t.data_type
        assert ours_t["raw_data"] == pb_t.raw_data
    # and protobuf runtime re-serialization round-trips through our reader
    again = P.decode_model(pb_model.SerializeToString())
    assert [n["op_type"] for n in again["graph"]["node"]] == [
        n.op_type for n in pb_model.graph.node
    ]


@requires_transformers
def test_torch_exported_reference_model_runs(tmp_path):
    """Oracle: torch's own C++ ONNX writer exports a tiny HF wav2vec2; our
    reader parses those bytes and our evaluator reproduces torch's output.

    (torch's python-side export needs the `onnx` package only for the
    onnxscript-function insertion step, a no-op for standard ops — stubbed.)
    """
    import torch
    import transformers
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=128,
        conv_dim=[32] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    torch_model = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    speech = torch.randn(1, SEQLEN)
    with torch.no_grad():
        want = torch_model(speech).logits.numpy()

    path = str(tmp_path / "hf.onnx")
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, _: proto
    try:
        torch.onnx.export(
            torch_model, (speech,), path, dynamo=False,
            opset_version=OPSET_VERSION, input_names=["speech"],
            output_names=["logits"],
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    model = OnnxModel(path)
    (got,) = model.run({"speech": speech.numpy()})
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_export_cli_onnx(tmp_path, base_artifact, monkeypatch):
    cfg, params, _ = base_artifact
    from gsoc_wav2vec2_tpu.cli.export import main
    from gsoc_wav2vec2_tpu.models.modeling import Wav2Vec2ForCTC

    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(cfg, params=params).save_pretrained(model_dir)
    out_dir = str(tmp_path / "onnx_out")
    monkeypatch.setattr(
        sys, "argv",
        ["export", "--model_id", model_dir, "--saved_model_dir", out_dir,
         "--seqlen", str(SEQLEN), "--format", "onnx"],
    )
    main()
    path = os.path.join(out_dir, "model.onnx")
    assert os.path.isfile(path)
    assert os.path.isfile(os.path.join(out_dir, "config.json"))
    speech = np.random.RandomState(3).randn(1, SEQLEN).astype(np.float32)
    (got,) = OnnxModel(path).run({"speech": speech})
    want = np.asarray(
        wav2vec2_for_ctc_forward(
            params, cfg, jnp.asarray(speech), training=False,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
