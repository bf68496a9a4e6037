from .onnx_export import export_onnx
from .onnx_numpy import OnnxModel
from .stablehlo import export_model, load_exported

__all__ = ["export_model", "load_exported", "export_onnx", "OnnxModel"]
