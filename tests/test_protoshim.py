"""Vendored minimal protobuf runtime (vendor/protoshim): wire-format
conformance against the published encoding examples
(https://protobuf.dev/programming-guides/encoding/), descriptor parsing of
the real pyspark StateMessage gencode, and message roundtrips. The
strongest check lives elsewhere: test_streaming_events.py's
test_sessionize_tws_matches_legacy drives the full state-server protocol
against the JVM's REAL protobuf parser."""

import os
import sys

import pytest

SHIM = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "gdalcubes_cpp_spark", "vendor", "protoshim")
try:
    import google.protobuf  # noqa: F401
    _HAVE_REAL = "protoshim" not in getattr(google.protobuf, "__file__", "")
except ImportError:
    _HAVE_REAL = False

if not _HAVE_REAL and SHIM not in sys.path:
    sys.path.insert(0, SHIM)

# load the shim engine by file path so this works whether or not a real
# google.protobuf shadows the package name
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "protoshim_mini", os.path.join(SHIM, "google", "protobuf", "_mini.py"))
_mini = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mini)


def test_varint_spec_vectors():
    """The encoding guide's worked examples: 1 -> 01, 150 -> 9601,
    and -2 as a 64-bit two's-complement 10-byte varint."""
    assert _mini.enc_varint(1) == b"\x01"
    assert _mini.enc_varint(150) == b"\x96\x01"
    assert _mini.dec_varint(b"\x96\x01", 0) == (150, 2)
    neg = _mini.enc_varint(-2)
    assert len(neg) == 10
    assert _mini.dec_varint(neg, 0)[0] == (1 << 64) - 2


def test_tag_and_string_field_vector():
    """Field 2 (string) "testing" serializes to 12 07 74...67 — the
    guide's canonical example."""
    fd = _mini.FieldDescriptor("b", 2, 1, _mini.T_STRING, None, None, False)
    assert _mini.Message._enc_one(fd, "testing") == \
        b"\x12\x07\x74\x65\x73\x74\x69\x6e\x67"


def test_statemessage_gencode_parses():
    import importlib

    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
    importlib.reload(sm)
    # descriptor subset: oneofs, nested messages, enums
    d = sm.StateRequest.DESCRIPTOR
    assert d.oneofs == ["method"]
    assert d.fields_by_name["version"].number == 1
    assert sm.PRE_INIT == 0 and sm.DATA_PROCESSED == 3 and sm.CLOSED == 5

    cmd = sm.StateCallCommand()
    cmd.stateName = "sess"
    cmd.ttl.durationMs = 5000
    msg = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd))
    wire = msg.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(wire)
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "sess" and got.ttl.durationMs == 5000

    # repeated message + proto3-optional presence
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(timestampMs=123), sm.TimerInfo(key=b"k", timestampMs=9)])
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in r2.timer] == [123, 9]
    assert not r2.timer[0].HasField("key") and r2.timer[1].key == b"k"
    # proto3 implicit presence: defaults round-trip to zero bytes
    assert sm.StateResponse(statusCode=0, errorMessage="",
                            value=b"").SerializeToString() == b""


def test_unknown_fields_skipped():
    fdp = _mini.FieldDescriptor("x", 1, 1, _mini.T_INT32, None, None, False)
    d = _mini.Descriptor("M", ".M")
    d.add_field(fdp)
    cls = _mini.make_message_class(d)
    # field 9 (unknown, varint) + field 1 = 7
    m = cls()
    m.ParseFromString(b"\x48\x2a\x08\x07")
    assert m.x == 7


@pytest.mark.skipif(not _HAVE_REAL, reason="real protobuf not installed")
def test_matches_real_protobuf():
    """When the genuine runtime is present, byte-compare serializations."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm_real

    sys.path.insert(0, SHIM)
    msg = sm_real.StateRequest(
        version=2,
        statefulProcessorCall=sm_real.StatefulProcessorCall(
            getValueState=sm_real.StateCallCommand(stateName="a", schema="b")))
    fd = _mini.parse_file_descriptor(
        sm_real.DESCRIPTOR.serialized_pb)  # pragma: no cover
    cls = _mini.make_message_class(
        fd.message_types_by_name["StateRequest"])
    mine = cls()
    mine.ParseFromString(msg.SerializeToString())
    assert mine.SerializeToString() == msg.SerializeToString()
