"""Property-based round-trip fuzz of the thrift binary codec: any
value tree a spec can describe must survive encode→decode bit-exactly,
and decoding must also tolerate interleaved unknown fields. The wire
layer under the hive catalog is hand-written (no thrift library), so
the codec invariants get machine-generated coverage, not just the few
shapes the HMS structs happen to use."""

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg import thrift_proto as T

# strategies for (ttype, subspec, value) triples ----------------------------

_scalars = st.sampled_from(
    [
        (T.BOOL, None),
        (T.I16, None),
        (T.I32, None),
        (T.I64, None),
        (T.DOUBLE, None),
        (T.STRING, None),
    ]
)


def _value_for(ttype: int, sub, draw):
    if ttype == T.BOOL:
        return draw(st.booleans())
    if ttype == T.I16:
        return draw(st.integers(-(2**15), 2**15 - 1))
    if ttype == T.I32:
        return draw(st.integers(-(2**31), 2**31 - 1))
    if ttype == T.I64:
        return draw(st.integers(-(2**63), 2**63 - 1))
    if ttype == T.DOUBLE:
        return draw(
            st.floats(allow_nan=False, allow_infinity=True, width=64)
        )
    if ttype == T.STRING:
        return draw(st.text(max_size=40))
    if ttype == T.LIST:
        et, esub = sub
        return [_value_for(et, esub, draw) for _ in range(draw(st.integers(0, 4)))]
    if ttype == T.MAP:
        kt, vt, vsub = sub
        return {
            draw(st.text(max_size=10)): _value_for(vt, vsub, draw)
            for _ in range(draw(st.integers(0, 4)))
        }
    if ttype == T.STRUCT:
        return _struct_value(sub, draw)
    raise AssertionError(ttype)


def _struct_value(spec, draw):
    out = {}
    for fid, (name, ttype, sub) in spec.items():
        if draw(st.booleans()):  # thrift fields are optional
            out[name] = _value_for(ttype, sub, draw)
    return out


@st.composite
def spec_and_value(draw, depth=2):
    """A random StructSpec (bounded depth) plus a conforming value."""
    n_fields = draw(st.integers(1, 5))
    spec = {}
    for i in range(n_fields):
        fid = i + 1
        name = f"f{fid}"
        if depth > 0 and draw(st.integers(0, 3)) == 0:
            kind = draw(st.sampled_from(["struct", "list", "map"]))
            if kind == "struct":
                inner = draw(spec_and_value(depth=depth - 1))[0]
                spec[fid] = (name, T.STRUCT, inner)
            elif kind == "list":
                et, esub = draw(_scalars)
                spec[fid] = (name, T.LIST, (et, esub))
            else:
                vt, vsub = draw(_scalars)
                spec[fid] = (name, T.MAP, (T.STRING, vt, vsub))
        else:
            ttype, sub = draw(_scalars)
            spec[fid] = (name, ttype, sub)
    value = _struct_value(spec, draw)
    return spec, value


@settings(max_examples=200, deadline=None)
@given(spec_and_value())
def test_struct_roundtrip(sv):
    spec, value = sv
    w = T.BinaryWriter()
    T.write_struct(w, spec, value)
    r = T.BinaryReader(io.BytesIO(w.getvalue()))
    assert T.read_struct(r, spec) == value


@settings(max_examples=100, deadline=None)
@given(spec_and_value(), st.integers(0, 2**15 - 1))
def test_unknown_field_skipped(sv, extra):
    """Inject a foreign field (id 30000, i64) mid-struct: decode must
    skip it and still return every known field intact."""
    spec, value = sv
    w = T.BinaryWriter()
    w.write_field_begin(T.I64, 30000)
    w.write_i64(extra)
    T.write_struct(w, spec, value)
    r = T.BinaryReader(io.BytesIO(w.getvalue()))
    assert T.read_struct(r, spec) == value


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30), st.integers(0, 2**31 - 1))
def test_message_envelope_roundtrip(name, seqid):
    w = T.BinaryWriter()
    w.write_message_begin(name, T.CALL, seqid)
    r = T.BinaryReader(io.BytesIO(w.getvalue()))
    assert r.read_message_begin() == (name, T.CALL, seqid)
