"""onnx_proto reader/writer: round-trip and parse of a REAL torch ONNX
export (validates the hand-rolled protobuf wire-format code against the
actual onnx serialization torch produces)."""

import numpy as np
import pytest

from fangyan_tts_tpu.data.onnx_proto import load_graph, save_model


def test_writer_reader_roundtrip(tmp_path):
    w = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "a.bias": np.ones(3, np.float32),
        "ids": np.asarray([5, -2], np.int64),
    }
    path = tmp_path / "m.onnx"
    save_model(
        str(path),
        nodes=[("Gemm", ["x", "a.weight", "a.bias"], ["y"], {"transB": 1, "alpha": 1.0})],
        initializers=w, inputs=["x"], outputs=["y"],
    )
    g = load_graph(str(path))
    assert g.inputs == ["x"] and g.outputs == ["y"]
    got = g.weights()
    for k in w:
        np.testing.assert_array_equal(got[k], w[k])
    (node,) = g.nodes
    assert node.op_type == "Gemm"
    assert node.attr("transB") == 1
    assert node.attr("alpha") == pytest.approx(1.0)


def test_parse_real_torch_export(tmp_path):
    torch = pytest.importorskip("torch")
    # torch's legacy exporter only needs the `onnx` package for an optional
    # onnxscript post-step; skip it (not installed in this image)
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
    try:
        class M(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = torch.nn.Conv1d(4, 8, 3, stride=2, padding=1, groups=2)
                self.lin = torch.nn.Linear(8, 5)

            def forward(self, x):
                return self.lin(torch.relu(self.conv(x)).mean(-1))

        m = M().eval()
        path = tmp_path / "tiny.onnx"
        torch.onnx.export(m, (torch.randn(2, 4, 16),), str(path),
                          input_names=["feats"], output_names=["emb"], dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    g = load_graph(str(path))
    assert g.inputs == ["feats"] and g.outputs == ["emb"]
    w = g.weights()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    # no BN here, so names are preserved
    for k in sd:
        np.testing.assert_allclose(w[k], sd[k], rtol=1e-6)
    conv = next(n for n in g.nodes if n.op_type == "Conv")
    assert conv.attr("strides") == [2]
    assert conv.attr("group") == 2
    assert conv.attr("pads") == [1, 1]
