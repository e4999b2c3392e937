"""Unit tests for the HLO conv/dot FLOP parser (tools/hlo_flops.py).

This parser is the source of every MFU number in docs/PERFORMANCE.md and the
bench JSON, so its failure modes are regression-tested directly: the ADVICE r3
findings were (a) instruction names like param_0 repeat across computations,
so a flat name->shape table can size an operand from the WRONG computation,
and (b) unresolvable operands were silently dropped. The round-2 hand parse
had exactly bug (a): it reported 9.79 TFLOP/NFE for the flagship forward
where the scoped parse (cross-validated: full sampler HLO == exactly 4x the
standalone forward; CPU-backend parse agrees) gives 8.57.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.hlo_flops import conv_dot_flops


def test_dot_with_inline_shapes():
    hlo = """
ENTRY %main (a: f32[8,64], b: f32[64,32]) -> f32[8,32] {
  %a = f32[8,64]{1,0} parameter(0)
  %b = f32[64,32]{1,0} parameter(1)
  ROOT %d = f32[8,32]{1,0} dot(f32[8,64]{1,0} %a, f32[64,32]{1,0} %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}
"""
    out = conv_dot_flops(hlo)
    assert out["flops"] == 2 * 8 * 32 * 64
    assert out["n_dot"] == 1 and out["skipped"] == 0


def test_shape_table_scoped_per_computation():
    """param_0 is defined in two computations with DIFFERENT shapes; the conv
    in the second must be sized from ITS OWN computation's definition (the
    flat-table bug would use the last/global definition)."""
    hlo = """
%comp_a (param_0: f32[3,3,999,999]) -> f32[3,3,999,999] {
  %param_0 = f32[3,3,999,999]{3,2,1,0} parameter(0)
  ROOT %t = f32[3,3,999,999]{3,2,1,0} tanh(%param_0)
}

%comp_b (param_0: f32[3,3,8,4], p1: f32[1,16,16,8]) -> f32[1,16,16,4] {
  %param_0 = f32[3,3,8,4]{3,2,1,0} parameter(0)
  %p1 = f32[1,16,16,8]{3,2,1,0} parameter(1)
  ROOT %c = f32[1,16,16,4]{3,2,1,0} convolution(%p1, %param_0), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

ENTRY %main (x: f32[1,16,16,8], w: f32[3,3,8,4]) -> f32[1,16,16,4] {
  %x = f32[1,16,16,8]{3,2,1,0} parameter(0)
  %w = f32[3,3,8,4]{3,2,1,0} parameter(1)
  ROOT %call = f32[1,16,16,4]{3,2,1,0} fusion(%x, %w), kind=kOutput, calls=%comp_b
}
"""
    out = conv_dot_flops(hlo)
    # 2 * out(1*16*16*4) * spatial(3*3) * k_in(8)
    assert out["conv_flops"] == 2 * (16 * 16 * 4) * 9 * 8, out
    assert out["n_conv"] == 1 and out["skipped"] == 0


def test_unresolvable_operand_counts_as_skipped():
    hlo = """
ENTRY %main (x: f32[4,4]) -> f32[4,4] {
  %x = f32[4,4]{1,0} parameter(0)
  ROOT %c = f32[4,4]{1,0} convolution(%x, %undefined_name), dim_labels=bf_io->bf
}
"""
    out = conv_dot_flops(hlo)
    assert out["skipped"] == 1 and out["flops"] == 0


def test_canonicalized_dot_as_conv():
    """XLA canonicalizes dot into convolution with non-spatial dim_labels."""
    hlo = """
ENTRY %main (a: f32[8,64], b: f32[64,32]) -> f32[8,32] {
  %a = f32[8,64]{1,0} parameter(0)
  %b = f32[64,32]{1,0} parameter(1)
  ROOT %c = f32[8,32]{1,0} convolution(%a, %b), dim_labels=bf_io->bf
}
"""
    out = conv_dot_flops(hlo)
    assert out["conv_flops"] == 2 * 8 * 32 * 64
    assert out["skipped"] == 0
