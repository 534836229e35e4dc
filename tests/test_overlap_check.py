"""Unit tests for the scheduled-HLO overlap analyzer
(tools/overlap_check.analyze_schedule) on synthetic HLO text — the
tool's TPU AOT compile path needs the tunnel; the parsing/classification
layer is testable anywhere."""

from tools.overlap_check import analyze_schedule

HLO = """\
HloModule jit_step, is_scheduled=true

%fused_computation (p0: f32[128,128]) -> f32[128,128] {
  %p0 = f32[128,128]{1,0} parameter(0)
  ROOT %m = f32[128,128]{1,0} multiply(%p0, %p0)
}

ENTRY %main (arg0: f32[128,128]) {
  %arg0 = f32[128,128]{1,0} parameter(0)
  %ag-start = (f32[128,128]{1,0}, f32[1024,128]{1,0}) all-gather-start(%arg0), dimensions={0}
  %dot.1 = f32[128,128]{1,0} dot(%arg0, %arg0), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  %fus.1 = f32[128,128]{1,0} fusion(%dot.1), kind=kLoop, calls=%fused_computation
  %ag-done = f32[1024,128]{1,0} all-gather-done(%ag-start)
  %ar.1 = f32[128,128]{1,0} all-reduce(%fus.1), to_apply=%fused_computation
  %ag2-start = (f32[128,128]{1,0}, f32[1024,128]{1,0}) all-gather-start(%ar.1), dimensions={0}
  %ag2-done = f32[1024,128]{1,0} all-gather-done(%ag2-start)
  ROOT %out = f32[1024,128]{1,0} add(%ag-done, %ag2-done)
}
"""


def test_analyze_schedule_classifies_async_and_sync():
    rows = analyze_schedule(HLO)
    by_name = {r["name"]: r for r in rows}
    # overlapped async pair (keyed by the -start name): dot + fusion
    # scheduled between start and done
    ag = by_name["ag-start"]
    assert ag["async"] and not ag["exposed"]
    assert ag["ops_between"] == 2 and ag["heavy_ops_between"] == 2
    # dot flops counted: 2 * 128*128 * 128
    assert ag["dot_flops_between"] == 2.0 * 128 * 128 * 128
    # payload = the start op's printed tuple (operand + gathered output)
    assert ag["payload_bytes"] == (128 * 128 + 1024 * 128) * 4
    # exposed async pair: nothing between start and done
    ag2 = by_name["ag2-start"]
    assert ag2["async"] and ag2["exposed"]
    # sync collective: always exposed
    ar = by_name["ar.1"]
    assert not ar["async"] and ar["exposed"]
    assert ar["payload_bytes"] == 128 * 128 * 4
