"""Declarative FlatBuffers schema for `.rten` + a generic reader/writer.

The table/field layout mirrors the reference schema exactly
(reference: src/schema.fbs) so files are binary-interchangeable with the
reference toolchain. Instead of flatc-generated accessors (the reference ships
10k LoC of generated code, src/schema_generated.rs), we drive both a small
hand-written binary reader and the `flatbuffers` Builder from one declarative
spec — field kinds + slot numbers in schema declaration order.

Quantization extension (new scope per BASELINE.json, not in the reference):
 - `ConstantDataType` gains Int8=2, UInt8=3 (appended enum values — binary
   compatible; reference files never use them).
 - `OperatorType` gains DequantizeLinear..QLinearMatMul appended after If.
 - `OperatorAttrs` union gains QuantizeAttrs / QLinearMatMulAttrs appended.
"""

from __future__ import annotations

import struct
from typing import Any

import flatbuffers
import numpy as np

# ---------------------------------------------------------------------------
# Enums (reference: src/schema.fbs:12-163, 353-356, 366-369, 416-422, 489-492)
# ---------------------------------------------------------------------------

OPERATOR_TYPES = [
    "Add", "ArgMin", "ArgMax", "AveragePool", "BatchNormalization", "Cast",
    "Clip", "Concat", "ConstantOfShape", "Conv", "ConvTranspose", "Cos",
    "CumSum", "Div", "Equal", "Erf", "Expand", "Flatten", "Gather", "Gemm",
    "GlobalAveragePool", "Greater", "GRU", "Identity", "LeakyRelu", "Less",
    "LessOrEqual", "Log", "LogSoftmax", "LSTM", "MatMul", "MaxPool", "Mod",
    "Mul", "Pad", "Pow", "Range", "ReduceMean", "ReduceL2", "Relu", "Reshape",
    "Resize", "Shape", "Sigmoid", "Sin", "Slice", "Split", "Sqrt", "Squeeze",
    "Softmax", "Sub", "Tanh", "Transpose", "Unsqueeze", "Where",
    # New operators appended for binary compatibility (schema.fbs:69-120)
    "ReduceProd", "ReduceSum", "ReduceMin", "ReduceMax", "NonZero",
    "ScatterElements", "Tile", "Not", "Abs", "Max", "Mean", "Min", "Sum",
    "OneHot", "Round", "Floor", "Ceil", "Reciprocal", "TopK", "Neg", "Exp",
    "GreaterOrEqual", "Size", "Tan", "Acos", "Asin", "Atan",
    "InstanceNormalization", "HardSigmoid", "HardSwish", "And", "Or", "Xor",
    "Trilu", "ScatterND", "NonMaxSuppression", "Sign", "GatherElements",
    "LayerNormalization", "ReduceSumSquare", "RandomUniform", "Elu",
    "RandomUniformLike", "RandomNormal", "RandomNormalLike", "Softplus",
    "GatherND", "Gelu", "Einsum", "If",
    # --- rten_tpu quantization extension (appended; not in reference) ---
    "DequantizeLinear", "QuantizeLinear", "DynamicQuantizeLinear",
    "QLinearMatMul",
]

RNN_DIRECTIONS = ["Forward", "Reverse", "Bidirectional"]
AUTO_PAD = ["Same", "NotSet"]
DATA_TYPES = ["Int32", "Float"]
COORD_TRANSFORM_MODES = ["HalfPixel", "Asymmetric", "AlignCorners"]
NEAREST_MODES = ["Floor", "Ceil", "RoundPreferFloor", "RoundPreferCeil"]
RESIZE_MODES = ["Nearest", "Linear"]
NMS_BOX_ORDERS = ["TopLeftBottomRight", "CenterWidthHeight"]
PAD_MODES = ["Constant", "Reflect"]
SCATTER_REDUCTIONS = ["None", "Add", "Mul", "Min", "Max"]
# Int8/UInt8 appended (extension); reference has Int32/Float32 only.
CONSTANT_DATA_TYPES = ["Int32", "Float32", "Int8", "UInt8"]

CONSTANT_DTYPE_TO_NUMPY = {
    "Int32": np.int32,
    "Float32": np.float32,
    "Int8": np.int8,
    "UInt8": np.uint8,
}
NUMPY_TO_CONSTANT_DTYPE = {
    np.dtype(np.int32): "Int32",
    np.dtype(np.float32): "Float32",
    np.dtype(np.int8): "Int8",
    np.dtype(np.uint8): "UInt8",
}

# ---------------------------------------------------------------------------
# Unions — member order defines the type tag (tag = index + 1; 0 = NONE).
# ---------------------------------------------------------------------------

UNIONS: dict[str, list[str]] = {
    # reference: src/schema.fbs:166-210 (+ extension entries appended)
    "OperatorAttrs": [
        "ArgMaxAttrs", "AveragePoolAttrs", "BatchNormalizationAttrs",
        "CastAttrs", "ConcatAttrs", "ConstantOfShapeAttrs", "ConvAttrs",
        "ConvTransposeAttrs", "FlattenAttrs", "GatherAttrs", "GemmAttrs",
        "GRUAttrs", "LeakyReluAttrs", "LSTMAttrs", "MaxPoolAttrs",
        "ReduceMeanAttrs", "ReshapeAttrs", "ResizeAttrs", "SplitAttrs",
        "SoftmaxAttrs", "TransposeAttrs",
        "ModAttrs", "ScatterElementsAttrs", "OneHotAttrs", "TopKAttrs",
        "HardSigmoidAttrs", "TriluAttrs", "ScatterNDAttrs",
        "NonMaxSuppressionAttrs", "LayerNormalizationAttrs",
        "RandomUniformAttrs", "EluAttrs", "RandomUniformLikeAttrs",
        "RandomNormalAttrs", "RandomNormalLikeAttrs", "GatherNDAttrs",
        "GeluAttrs", "EinsumAttrs", "IfAttrs", "PadAttrs",
        # --- rten_tpu quantization extension ---
        "QuantizeAttrs", "QLinearMatMulAttrs",
    ],
    "NodeKind": ["OperatorNode", "ConstantNode", "ValueNode"],
    "ConstantData": ["FloatData", "IntData", "Int8Data", "UInt8Data"],
    "Scalar": ["IntScalar", "FloatScalar"],
}

# ---------------------------------------------------------------------------
# Tables. Each field: (name, kind, default).
#   kind ∈ scalar names | 'string' | 'table:X' | 'union:X' | 'vector:<elem>'
#   A union occupies TWO slots (type, value); list it once.
#   default=None on a scalar means "nullable": absent reads as None and any
#   provided value is force-written.
# ---------------------------------------------------------------------------

TABLES: dict[str, list[tuple[str, str, Any]]] = {
    "Model": [
        ("schema_version", "int", 0),
        ("graph", "table:Graph", None),
        ("metadata", "table:Metadata", None),
    ],
    "Graph": [
        ("nodes", "vector:table:Node", None),
        ("inputs", "vector:uint", None),
        ("outputs", "vector:uint", None),
        ("captures", "vector:uint", None),
    ],
    "Node": [
        ("name", "string", None),
        ("data", "union:NodeKind", None),
    ],
    "OperatorNode": [
        ("type", "ubyte", 0),
        ("attrs", "union:OperatorAttrs", None),
        ("inputs", "vector:int", None),
        ("outputs", "vector:int", None),
    ],
    "ConstantNode": [
        ("shape", "vector:uint", None),
        ("data", "union:ConstantData", None),
        ("dtype", "ushort", None),
        ("data_offset", "ulong", None),
    ],
    "ValueNode": [
        ("shape", "vector:table:Dim", None),
    ],
    "Dim": [
        ("value", "uint", 0),
        ("name", "string", None),
    ],
    "Metadata": [
        ("onnx_hash", "string", None),
        ("description", "string", None),
        ("license", "string", None),
        ("commit", "string", None),
        ("code_repository", "string", None),
        ("model_repository", "string", None),
        ("run_id", "string", None),
        ("run_url", "string", None),
    ],
    "FloatData": [("data", "vector:float", None)],
    "IntData": [("data", "vector:int", None)],
    "Int8Data": [("data", "vector:byte", None)],
    "UInt8Data": [("data", "vector:ubyte", None)],
    "IntScalar": [("value", "int", 0)],
    "FloatScalar": [("value", "float", 0.0)],
    # --- operator attrs (reference: src/schema.fbs:212-453) ---
    "ArgMaxAttrs": [("axis", "int", 0), ("keep_dims", "bool", False)],
    "AveragePoolAttrs": [
        ("kernel_size", "vector:uint", None),
        ("auto_pad", "ubyte", 0),
        ("pads", "vector:uint", None),
        ("strides", "vector:uint", None),
        ("count_include_pad", "bool", False),
    ],
    "BatchNormalizationAttrs": [("epsilon", "float", 0.0)],
    "CastAttrs": [("to", "ubyte", 0)],
    "ConcatAttrs": [("axis", "int", 0)],
    "ConstantOfShapeAttrs": [("value", "union:Scalar", None)],
    "ConvAttrs": [
        ("auto_pad", "ubyte", 0),
        ("pads", "vector:uint", None),
        ("groups", "uint", 0),
        ("strides", "vector:uint", None),
        ("dilations", "vector:uint", None),
    ],
    "ConvTransposeAttrs": [
        ("strides", "vector:uint", None),
        ("auto_pad", "ubyte", 1),  # default NotSet (schema.fbs:273)
        ("pads", "vector:uint", None),
    ],
    "FlattenAttrs": [("axis", "int", 0)],
    "GatherAttrs": [("axis", "int", 0)],
    "GemmAttrs": [
        ("alpha", "float", 0.0),
        ("beta", "float", 0.0),
        ("transpose_a", "bool", False),
        ("transpose_b", "bool", False),
    ],
    "GRUAttrs": [
        ("direction", "ubyte", 0),
        ("hidden_size", "uint", 0),
        ("linear_before_reset", "bool", False),
    ],
    "LeakyReluAttrs": [("alpha", "float", 0.0)],
    "LSTMAttrs": [("direction", "ubyte", 0), ("hidden_size", "uint", 0)],
    "MaxPoolAttrs": [
        ("kernel_size", "vector:uint", None),
        ("auto_pad", "ubyte", 0),
        ("pads", "vector:uint", None),
        ("strides", "vector:uint", None),
    ],
    "ReduceMeanAttrs": [("axes", "vector:int", None), ("keep_dims", "bool", False)],
    "ReshapeAttrs": [("allow_zero", "bool", False)],
    "ResizeAttrs": [
        ("mode", "ubyte", 0),
        ("coord_mode", "ubyte", 0),
        ("nearest_mode", "ubyte", 0),
    ],
    "SplitAttrs": [("axis", "int", 0)],
    "SoftmaxAttrs": [("axis", "int", 0)],
    "TransposeAttrs": [("perm", "vector:uint", None)],
    "ModAttrs": [("fmod", "bool", False)],
    "ScatterElementsAttrs": [("axis", "int", 0), ("reduction", "ubyte", 0)],
    "OneHotAttrs": [("axis", "int", 0)],
    "TopKAttrs": [
        ("axis", "int", 0),
        ("largest", "bool", False),
        ("sorted", "bool", False),
    ],
    "HardSigmoidAttrs": [("alpha", "float", 0.0), ("beta", "float", 0.0)],
    "TriluAttrs": [("upper", "bool", False)],
    "ScatterNDAttrs": [("reduction", "ubyte", 0)],
    "NonMaxSuppressionAttrs": [("box_order", "ubyte", 0)],
    "LayerNormalizationAttrs": [("axis", "int", 0), ("epsilon", "float", 0.0)],
    "RandomUniformAttrs": [
        ("shape", "vector:uint", None),
        ("high", "float", 0.0),
        ("low", "float", 0.0),
        ("seed", "float", None),
    ],
    "EluAttrs": [("alpha", "float", 0.0)],
    "RandomUniformLikeAttrs": [
        ("high", "float", 0.0),
        ("low", "float", 0.0),
        ("seed", "float", None),
    ],
    "RandomNormalAttrs": [
        ("mean", "float", 0.0),
        ("scale", "float", 0.0),
        ("seed", "float", None),
        ("shape", "vector:uint", None),
    ],
    "RandomNormalLikeAttrs": [
        ("mean", "float", 0.0),
        ("scale", "float", 0.0),
        ("seed", "float", None),
    ],
    "GatherNDAttrs": [("batch_dims", "int", 0)],
    "GeluAttrs": [],
    "EinsumAttrs": [("equation", "string", None)],
    "IfAttrs": [
        ("then_branch", "table:Graph", None),
        ("else_branch", "table:Graph", None),
    ],
    "PadAttrs": [("mode", "ubyte", 0)],
    # --- rten_tpu quantization extension ---
    "QuantizeAttrs": [("axis", "int", 1), ("output_dtype", "ubyte", 0)],
    "QLinearMatMulAttrs": [],
}

_SCALAR_FMT = {
    "bool": ("<?", 1),
    "byte": ("<b", 1),
    "ubyte": ("<B", 1),
    "short": ("<h", 2),
    "ushort": ("<H", 2),
    "int": ("<i", 4),
    "uint": ("<I", 4),
    "long": ("<q", 8),
    "ulong": ("<Q", 8),
    "float": ("<f", 4),
    "double": ("<d", 8),
}
_VECTOR_NUMPY = {
    "bool": np.bool_,
    "byte": np.int8,
    "ubyte": np.uint8,
    "short": np.int16,
    "ushort": np.uint16,
    "int": np.int32,
    "uint": np.uint32,
    "long": np.int64,
    "ulong": np.uint64,
    "float": np.float32,
    "double": np.float64,
}


# ---------------------------------------------------------------------------
# Generic reader
# ---------------------------------------------------------------------------


class FbsReader:
    """Reads tables per the spec above into plain dicts.

    Union fields read as ``(member_type_name, value_dict)``. Numeric vectors
    read as zero-copy numpy views into the underlying buffer.
    """

    def __init__(self, buf: bytes | bytearray | memoryview, base: int = 0):
        self.buf = memoryview(buf)
        self.base = base

    def _u16(self, pos: int) -> int:
        return struct.unpack_from("<H", self.buf, pos)[0]

    def _i32(self, pos: int) -> int:
        return struct.unpack_from("<i", self.buf, pos)[0]

    def _u32(self, pos: int) -> int:
        return struct.unpack_from("<I", self.buf, pos)[0]

    def root(self, table_name: str) -> dict:
        root_pos = self.base + self._u32(self.base)
        return self.read_table(table_name, root_pos)

    def _field_pos(self, table_pos: int, slot: int) -> int | None:
        """Absolute position of field data for vtable slot, or None if absent."""
        vtable_pos = table_pos - self._i32(table_pos)
        vtable_len = self._u16(vtable_pos)
        entry = 4 + 2 * slot
        if entry >= vtable_len:
            return None
        off = self._u16(vtable_pos + entry)
        if off == 0:
            return None
        return table_pos + off

    def _read_scalar(self, kind: str, pos: int):
        fmt, _ = _SCALAR_FMT[kind]
        v = struct.unpack_from(fmt, self.buf, pos)[0]
        return v

    def _read_string(self, field_pos: int) -> str:
        spos = field_pos + self._u32(field_pos)
        n = self._u32(spos)
        return bytes(self.buf[spos + 4 : spos + 4 + n]).decode("utf-8")

    def _read_vector(self, elem_kind: str, field_pos: int):
        vpos = field_pos + self._u32(field_pos)
        n = self._u32(vpos)
        data_pos = vpos + 4
        if elem_kind.startswith("table:"):
            name = elem_kind[len("table:") :]
            out = []
            for i in range(n):
                p = data_pos + 4 * i
                out.append(self.read_table(name, p + self._u32(p)))
            return out
        if elem_kind == "string":
            out = []
            for i in range(n):
                out.append(self._read_string(data_pos + 4 * i))
            return out
        np_t = _VECTOR_NUMPY[elem_kind]
        itemsize = np.dtype(np_t).itemsize
        arr = np.frombuffer(self.buf, dtype=np_t, count=n, offset=data_pos)
        del itemsize
        return arr

    def read_table(self, table_name: str, table_pos: int) -> dict:
        fields = TABLES[table_name]
        out: dict[str, Any] = {"__table__": table_name}
        slot = 0
        for name, kind, default in fields:
            if kind.startswith("union:"):
                union_name = kind[len("union:") :]
                type_pos = self._field_pos(table_pos, slot)
                val_pos = self._field_pos(table_pos, slot + 1)
                slot += 2
                if type_pos is None or val_pos is None:
                    out[name] = None
                    continue
                tag = self._read_scalar("ubyte", type_pos)
                if tag == 0:
                    out[name] = None
                    continue
                member = UNIONS[union_name][tag - 1]
                tpos = val_pos + self._u32(val_pos)
                out[name] = (member, self.read_table(member, tpos))
                continue
            fpos = self._field_pos(table_pos, slot)
            slot += 1
            if fpos is None:
                out[name] = default
                continue
            if kind == "string":
                out[name] = self._read_string(fpos)
            elif kind.startswith("table:"):
                tname = kind[len("table:") :]
                out[name] = self.read_table(tname, fpos + self._u32(fpos))
            elif kind.startswith("vector:"):
                out[name] = self._read_vector(kind[len("vector:") :], fpos)
            else:
                out[name] = self._read_scalar(kind, fpos)
        return out


# ---------------------------------------------------------------------------
# Generic writer (drives flatbuffers.Builder from the same spec)
# ---------------------------------------------------------------------------

_PREPEND_SLOT = {
    "bool": "PrependBoolSlot",
    "byte": "PrependInt8Slot",
    "ubyte": "PrependUint8Slot",
    "short": "PrependInt16Slot",
    "ushort": "PrependUint16Slot",
    "int": "PrependInt32Slot",
    "uint": "PrependUint32Slot",
    "long": "PrependInt64Slot",
    "ulong": "PrependUint64Slot",
    "float": "PrependFloat32Slot",
    "double": "PrependFloat64Slot",
}


class FbsWriter:
    def __init__(self) -> None:
        self.builder = flatbuffers.Builder(1024)

    def finish(self, root_offset: int, file_identifier: bytes = b"RTEN") -> bytes:
        self.builder.Finish(root_offset, file_identifier=file_identifier)
        return bytes(self.builder.Output())

    def _num_slots(self, table_name: str) -> int:
        n = 0
        for _, kind, _ in TABLES[table_name]:
            n += 2 if kind.startswith("union:") else 1
        return n

    def _write_vector(self, elem_kind: str, values) -> int:
        b = self.builder
        if elem_kind.startswith("table:"):
            name = elem_kind[len("table:") :]
            offs = [self.write_table(name, v) for v in values]
            b.StartVector(4, len(offs), 4)
            for off in reversed(offs):
                b.PrependUOffsetTRelative(off)
            return b.EndVector()
        if elem_kind == "string":
            offs = [b.CreateString(s) for s in values]
            b.StartVector(4, len(offs), 4)
            for off in reversed(offs):
                b.PrependUOffsetTRelative(off)
            return b.EndVector()
        np_t = _VECTOR_NUMPY[elem_kind]
        arr = np.ascontiguousarray(np.asarray(values).astype(np_t, copy=False))
        return b.CreateNumpyVector(arr)

    def write_table(self, table_name: str, data: dict) -> int:
        b = self.builder
        fields = TABLES[table_name]

        # First pass: build children (offset-typed fields) bottom-up.
        child_offsets: dict[str, Any] = {}
        for name, kind, _default in fields:
            val = data.get(name)
            if val is None:
                continue
            if kind == "string":
                child_offsets[name] = b.CreateString(val)
            elif kind.startswith("table:"):
                child_offsets[name] = self.write_table(kind[len("table:") :], val)
            elif kind.startswith("vector:"):
                child_offsets[name] = self._write_vector(kind[len("vector:") :], val)
            elif kind.startswith("union:"):
                member, member_data = val
                child_offsets[name] = self.write_table(member, member_data)

        # Second pass: the table itself.
        b.StartObject(self._num_slots(table_name))
        slot = 0
        for name, kind, default in fields:
            val = data.get(name)
            if kind.startswith("union:"):
                union_name = kind[len("union:") :]
                if val is not None:
                    member, _ = val
                    tag = UNIONS[union_name].index(member) + 1
                    b.PrependUint8Slot(slot, tag, 0)
                    b.PrependUOffsetTRelativeSlot(slot + 1, child_offsets[name], 0)
                slot += 2
                continue
            if kind in _SCALAR_FMT:
                if val is not None:
                    # default=None → nullable: force-write by passing a
                    # never-equal sentinel default to the builder.
                    sentinel = default if default is not None else None
                    getattr(b, _PREPEND_SLOT[kind])(slot, val, sentinel)
            else:
                if name in child_offsets:
                    b.PrependUOffsetTRelativeSlot(slot, child_offsets[name], 0)
            slot += 1
        return b.EndObject()


def enum_value(values: list[str], name: str) -> int:
    return values.index(name)


def enum_name(values: list[str], value: int) -> str:
    return values[value]
