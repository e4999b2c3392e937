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
the instruction definitions. Instruction names are only unique WITHIN a
computation (param_0 recurs in every fused computation), so the table is
scoped per computation — reset at every computation header — and an inline
operand shape, when printed, takes precedence. XLA also canonicalizes `dot`
into `convolution` with non-spatial dim_labels (e.g. `bf_io->bf`), which the
conv path handles naturally (no spatial dims => plain matmul count).

Any conv/dot whose operand shape cannot be resolved is tallied in
``skipped`` — callers should assert it is zero before trusting the total
(see ADVICE r3).
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

# '%name = f32[8,128]{1,0:T(8,128)} opcode(...)'  (also 'ROOT %name = ...')
_DEF_RE = re.compile(r"%([\w.\-]+) = [a-z0-9]+\[([0-9,]*)\]")
# operand: optional inline 'f32[1,2]{...} ' prefix + '%name'
_OPND = r"(?:[a-z0-9]+\[([0-9,]*)\]\S*\s+)?%([\w.\-]+)"
_CONV_CALL_RE = re.compile(r"convolution\(\s*" + _OPND + r",\s*" + _OPND + r"\s*\)")
_DOT_CALL_RE = re.compile(r"\bdot\(\s*" + _OPND + r",\s*" + _OPND + r"\s*\)")
_DIM_LABELS_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")
_LHS_CDIMS_RE = re.compile(r"lhs_contracting_dims=\{([0-9,]*)\}")
# '%computation.name (params...) -> result {'  /  'ENTRY %main (...) -> ... {'
_COMPUTATION_HEADER_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?[\w.\-]+\s*\(.*\)\s*->\s*.*\{\s*$")


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def _dims(s: str) -> Tuple[int, ...]:
    return tuple(int(v) for v in s.split(",") if v) if s else ()


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
    """Sum conv/dot FLOPs over the HLO text.

    Returns totals + op counts + a ``skipped`` count of conv/dot ops whose
    operand shape could not be resolved (assert it is zero before trusting
    ``flops``).
    """
    conv_total = dot_total = 0
    n_conv = n_dot = skipped = 0
    scope: dict = {}  # name -> shape, valid within the current computation

    def _operand_shape(inline: Optional[str], name: str) -> Optional[Tuple[int, ...]]:
        # Prefer the inline-printed shape; instruction names repeat across
        # computations, so the scoped table is the fallback, never the master.
        if inline is not None:
            return _dims(inline)
        return scope.get(name)

    for line in hlo_text.splitlines():
        if _COMPUTATION_HEADER_RE.match(line):
            scope = {}
            continue
        defm = _DEF_RE.search(line)
        if defm is None:
            continue
        out = _dims(defm.group(2))
        scope[defm.group(1)] = out
        if " convolution(" in line:
            call = _CONV_CALL_RE.search(line)
            if call is None:
                skipped += 1
                continue
            ker = _operand_shape(call.group(3), call.group(4))
            if ker is None:
                skipped += 1
                continue
            f = _conv_flops(out, ker, line[call.end():])
            if f is None:
                skipped += 1
                continue
            conv_total += f
            n_conv += 1
        elif " dot(" in line:
            call = _DOT_CALL_RE.search(line)
            if call is None:
                skipped += 1
                continue
            lhs = _operand_shape(call.group(1), call.group(2))
            if lhs is None:
                skipped += 1
                continue
            rest = line[call.end():]
            cd = _LHS_CDIMS_RE.search(rest)
            contract = (_prod(lhs[i] for i in _dims(cd.group(1)))
                        if cd else lhs[-1])
            dot_total += 2 * _prod(out) * contract
            n_dot += 1
    return {"conv_flops": conv_total, "dot_flops": dot_total,
            "flops": conv_total + dot_total,
            "n_conv": n_conv, "n_dot": n_dot, "skipped": skipped}
