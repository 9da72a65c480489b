"""One-shot AST-driven split of registry.py into the registry/
package (VERDICT r7 #3: the 12.5k-line single file grows ~3.4k lines
per round and is the collision hot spot).

Mechanics: the file is cut into CONTIGUOUS top-level-statement spans
(so module-level execution order -- oracle dict mutations, asserts --
is preserved by importing the parts in order), each span becomes a
module named for its dominant content, and every cross-span name
reference becomes an explicit `from .earlier import name` (verified:
a name may only be used by a LATER span, anything else aborts).
__init__.py imports every part in order and re-exports every
top-level name, so `registry.X` and `from ...registry import X` keep
working for all existing callers.

Run once; kept in tools/ as the audit trail of how the split was
produced.
"""

from __future__ import annotations

import ast
import builtins
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "mapreduce_implementation_grpc_spark")
SRC = os.path.join(PKG, "registry.py")

# (module_name, first_symbol) -- each part starts at the top-level
# statement defining first_symbol and runs to the next part's start.
# Names follow the file's own section comments; the mid-file parts are
# genuinely mixed (later rounds appended query+oracle pairs at the
# end), so their names describe the dominant content.
PARTS = [
    ("shared", None),  # module docstring, imports, shared SQL fragments
    ("reference_surface", "q_wordcount"),
    ("text_shaping", "q_text_stats"),
    ("curation", "q_decontaminate"),
    ("dedup", "q_dedup_exact"),
    ("similarity", "_query_vectors"),
    ("multimodal_q", "q_multimodal_meta"),
    ("events_analytics", "q_events_rollup"),
    ("oracle_builders", "_lang_hits_sql"),
    ("graph_layout", "q_zorder_cells"),
    ("eval_temporal", "q_linkage_sorted_neighborhood"),
    ("oracles_core", "ORACLES"),
    ("oracles_ext", "__ORACLES_EXT_SPLIT__"),   # auto: first stmt after dict literal
    ("oracles_ext2", "__ORACLES_EXT2_SPLIT__"),  # auto: midpoint of the ext span
    ("assembly", "QUERIES"),
]


def stmt_names(node) -> list[str]:
    names = []
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        names.append(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                names.append(t.id)
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        names.append(node.target.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            names.append((a.asname or a.name).split(".")[0])
    return names


def used_names(nodes) -> set[str]:
    used = set()
    for node in nodes:
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                used.add(sub.id)
    return used


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = list(tree.body)

    # statement start incl. decorators and the comment block above it
    starts = []
    prev_end = 0
    for node in stmts:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        s = start - 1  # 0-based
        while s - 1 > prev_end - 1 and s - 1 >= 0:
            stripped = lines[s - 1].strip()
            if stripped.startswith("#") or stripped == "":
                s -= 1
            else:
                break
        starts.append(s)
        prev_end = node.end_lineno
    ends = [node.end_lineno for node in stmts]  # 1-based inclusive

    # locate part boundaries as statement indices
    def index_of_symbol(sym: str) -> int:
        for i, node in enumerate(stmts):
            if sym in stmt_names(node):
                return i
        raise SystemExit(f"symbol {sym} not found")

    bounds = [0]
    for name, sym in PARTS[1:]:
        if sym == "__ORACLES_EXT_SPLIT__":
            bounds.append(index_of_symbol("ORACLES") + 1)
        elif sym == "__ORACLES_EXT2_SPLIT__":
            lo = index_of_symbol("ORACLES") + 1
            hi = index_of_symbol("QUERIES")
            bounds.append(lo + (hi - lo) // 2)
        else:
            bounds.append(index_of_symbol(sym))
    bounds.append(len(stmts))
    assert bounds == sorted(bounds), f"parts out of order: {bounds}"

    # per-part defined/used names
    part_stmts = [stmts[a:b] for a, b in zip(bounds, bounds[1:])]
    part_defs: list[dict[str, int]] = []
    for ps in part_stmts:
        defs = {}
        for node in ps:
            for n in stmt_names(node):
                defs.setdefault(n, node.lineno)
        part_defs.append(defs)

    owner: dict[str, int] = {}
    for i, defs in enumerate(part_defs):
        for n in defs:
            if n not in owner:
                owner[n] = i

    bi = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}
    outdir = os.path.join(PKG, "registry")
    os.makedirs(outdir, exist_ok=True)

    for i, ((name, _), ps) in enumerate(zip(PARTS, part_stmts)):
        used = used_names(ps)
        needed: dict[int, set[str]] = {}
        for n in sorted(used):
            if n in bi or n in part_defs[i]:
                continue
            if n not in owner:
                # locals/args are caught by the ast walk too; only
                # flag names that are nowhere at module level
                continue
            src_part = owner[n]
            if src_part == i:
                continue
            if src_part > i:
                raise SystemExit(
                    f"part {name} uses {n} defined in LATER part "
                    f"{PARTS[src_part][0]} -- adjust boundaries"
                )
            needed.setdefault(src_part, set()).add(n)

        body_start = starts[bounds[i]]
        body_end = ends[bounds[i + 1] - 1]
        body = "".join(lines[body_start:body_end])

        header = ""
        if i > 0:
            header = (
                f'"""registry part {i:02d}: {name} (split from the '
                'monolithic registry.py in round 8; see '
                'tools/split_registry.py)."""\n\n'
                "from __future__ import annotations\n\n"
            )
            for j in sorted(needed):
                syms = sorted(needed[j])
                imp = f"from .{PARTS[j][0]} import "
                line = imp + ", ".join(syms)
                if len(line) <= 79:
                    header += line + "\n"
                else:
                    header += imp + "(\n"
                    for s in syms:
                        header += f"    {s},\n"
                    header += ")\n"
            header += "\n"
        with open(os.path.join(outdir, f"{name}.py"), "w") as fh:
            fh.write(header + body)

    # __init__: import parts in order, re-export every top-level name
    init = [
        '"""Query/oracle registry package (split from the 12.5k-line',
        "registry.py in round 8, VERDICT r7 #3; tools/split_registry.py",
        "is the generator and audit trail). Parts import strictly",
        "earlier parts, so module-level execution order -- oracle dict",
        "construction, mutation, contract asserts -- is preserved.",
        '"""',
        "",
        "from __future__ import annotations",
        "",
    ]
    for i, (name, _) in enumerate(PARTS):
        exported = sorted(n for n in part_defs[i] if owner[n] == i)
        if not exported:
            continue
        init.append(f"from .{name} import (")
        for n in exported:
            init.append(f"    {n},")
        init.append(")")
    init.append("")
    with open(os.path.join(outdir, "__init__.py"), "w") as fh:
        fh.write("\n".join(init))

    os.remove(SRC)
    print(f"split into {len(PARTS)} parts under {outdir}")
    for (name, _), defs, (a, b) in zip(PARTS, part_defs, zip(bounds, bounds[1:])):
        n_lines = ends[b - 1] - starts[a]
        print(f"  {name:18s} stmts {a:4d}-{b:4d}  ~{n_lines} lines  {len(defs)} names")


if __name__ == "__main__":
    main()
