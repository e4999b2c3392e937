"""Exact conv+dot FLOP counting from compiled HLO text.

Why: on the axon backend `compiled.cost_analysis()` under-counts convolution
FLOPs ~17x (docs/PERFORMANCE.md round-2 roofline: it reported 565 GFLOP/NFE
where the convolutions alone are 9.79 TFLOP/NFE). The round-2 roofline parsed
the compiled HLO by hand; this module makes that methodology reusable.

Semantics: sums 2*MACs over every `convolution` and `dot` op in the HLO text
— the STATIC count. Ops inside a `while` body (a `lax.scan`) are counted
ONCE; multiply by the trip count yourself. For programs whose hot loop is a
scan of identical steps (the PC sampler, the multi-train-step program) the
static count IS the per-iteration count, since everything outside the loop
is negligible.

Parsing notes: post-optimization HLO does not print operand shapes inline
(`convolution(%fusion.1, %fusion.2)`), so we build a name->shape table from
the instruction definitions first. XLA also canonicalizes `dot` into
`convolution` with non-spatial dim_labels (e.g. `bf_io->bf`), which the conv
path handles naturally (no spatial dims => plain matmul count).
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

# '%name = f32[8,128]{1,0:T(8,128)} opcode(...)'  (also 'ROOT %name = ...')
_DEF_RE = re.compile(r"%([\w.\-]+) = [a-z0-9]+\[([0-9,]*)\]")
_CONV_CALL_RE = re.compile(r"convolution\(\s*(?:[a-z0-9]+\[[0-9,]*\]\S*\s+)?"
                           r"%([\w.\-]+),\s*(?:[a-z0-9]+\[[0-9,]*\]\S*\s+)?"
                           r"%([\w.\-]+)\s*\)")
_DOT_CALL_RE = re.compile(r"\bdot\(\s*(?:[a-z0-9]+\[[0-9,]*\]\S*\s+)?"
                          r"%([\w.\-]+),\s*(?:[a-z0-9]+\[[0-9,]*\]\S*\s+)?"
                          r"%([\w.\-]+)\s*\)")
_DIM_LABELS_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")
_LHS_CDIMS_RE = re.compile(r"lhs_contracting_dims=\{([0-9,]*)\}")


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def _dims(s: str) -> Tuple[int, ...]:
    return tuple(int(v) for v in s.split(",") if v) if s else ()


def _shape_table(hlo_text: str) -> Dict[str, Tuple[int, ...]]:
    table: Dict[str, Tuple[int, ...]] = {}
    for m in _DEF_RE.finditer(hlo_text):
        table[m.group(1)] = _dims(m.group(2))
    return table


def _conv_flops(out: Tuple[int, ...], ker: Tuple[int, ...],
                rest: str) -> Optional[int]:
    dl = _DIM_LABELS_RE.search(rest)
    if dl is None:  # default layout: kernel dims are [spatial..., i, o]
        k_spatial, k_in = ker[:-2], ker[-2]
    else:
        klab = dl.group(2)  # e.g. "01io", "o01i", "io" (canonicalized dot)
        k_spatial = tuple(ker[i] for i, c in enumerate(klab) if c.isdigit())
        if "i" not in klab:
            return None
        k_in = ker[klab.index("i")]
    # HLO kernel input-feature dim is already per-group, and prod(out) covers
    # all output channels, so feature_group_count needs no extra handling.
    return 2 * _prod(out) * _prod(k_spatial) * k_in


def conv_dot_flops(hlo_text: str) -> dict:
    """Sum conv/dot FLOPs over the HLO text. Returns totals + op counts."""
    shapes = _shape_table(hlo_text)
    conv_total = dot_total = 0
    n_conv = n_dot = 0
    for line in hlo_text.splitlines():
        defm = _DEF_RE.search(line)
        if defm is None:
            continue
        out = _dims(defm.group(2))
        if " convolution(" in line:
            call = _CONV_CALL_RE.search(line)
            if call is None:
                continue
            ker = shapes.get(call.group(2))
            if ker is None:
                continue
            f = _conv_flops(out, ker, line[call.end():])
            if f is not None:
                conv_total += f
                n_conv += 1
        elif " dot(" in line:
            call = _DOT_CALL_RE.search(line)
            if call is None:
                continue
            lhs = shapes.get(call.group(1))
            if lhs is None:
                continue
            rest = line[call.end():]
            cd = _LHS_CDIMS_RE.search(rest)
            contract = (_prod(lhs[i] for i in _dims(cd.group(1)))
                        if cd else lhs[-1])
            dot_total += 2 * _prod(out) * contract
            n_dot += 1
    return {"conv_flops": conv_total, "dot_flops": dot_total,
            "flops": conv_total + dot_total,
            "n_conv": n_conv, "n_dot": n_dot}
