"""One-shot AST-driven pre-split of registry/eval_temporal.py
(VERDICT r8 #6: at 2,569 lines it was the only part within sight of
the 3,000-line ceiling the r7 split established, and the next
rounds' temporal additions land there).

Same mechanics as tools/split_registry.py: cut at a CONTIGUOUS
top-level statement boundary (module execution order preserved by
importing the parts in order), verify no name defined in the second
span is referenced by the first, give the new part its own imports
(the used subset of the first part's import block plus explicit
`from .eval_temporal import` for first-part helpers it uses), and
rewrite the two downstream import sites (__init__, assembly) to pull
each name from the part that now defines it.

Run once; kept in tools/ as the audit trail.
"""

from __future__ import annotations

import ast
import builtins
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "mapreduce_implementation_grpc_spark", "registry")
SRC = os.path.join(REG, "eval_temporal.py")
NEW = os.path.join(REG, "eval_temporal2.py")

# q_corpus_drift_psi: the first statement after the record-linkage
# cluster (whose _linkage_frames helper is forward-referenced by
# q_linkage_sorted_neighborhood at the top of part 1, so the linkage
# cluster must stay in part 1 for a contiguous cut)
BOUNDARY_SYMBOL = "q_corpus_drift_psi"

HEADER1 = (
    '"""registry part 10: eval_temporal (split from the monolithic '
    'registry.py in round 8; pre-split again in round 9 -- see '
    'tools/split_eval_temporal.py)."""\n'
)
HEADER2 = (
    '"""registry part 10b: eval_temporal2 (round-9 pre-split of '
    'eval_temporal before it crossed the 3,000-line ceiling; see '
    'tools/split_eval_temporal.py). New temporal/eval queries go '
    'HERE."""\n'
)


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

    # statement start incl. decorators and the comment block above
    starts, prev_end = [], 0
    for node in stmts:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        s = start - 1
        while s - 1 > prev_end - 1 and s - 1 >= 0:
            stripped = lines[s - 1].strip()
            if stripped.startswith("#") or stripped == "":
                s -= 1
            else:
                break
        starts.append(s)
        prev_end = node.end_lineno

    cut = next(
        i for i, n in enumerate(stmts) if BOUNDARY_SYMBOL in stmt_names(n)
    )
    span1, span2 = stmts[:cut], stmts[cut:]
    def1 = {n for s in span1 for n in stmt_names(s)}
    def2 = {n for s in span2 for n in stmt_names(s)}

    # safety: the first span must not reference anything the second defines
    back_refs = used_names(span1) & (def2 - def1)
    assert not back_refs, f"span1 uses span2 names: {sorted(back_refs)}"

    # names the second span needs from part 1's top level: everything
    # else a span-2 function references is a local, a parameter, a
    # builtin, or a function-internal `from ..operators import` --
    # all of which move with the function body. (The coarse ast.walk
    # over-collects locals; filtering to def1 is exact for the import
    # rewrite, and the post-split package import + spot battery catch
    # anything genuinely unbound.)
    need2 = (used_names(span2) - def2 - set(dir(builtins))) & def1
    imports_from_shared = sorted(n for n in need2 if _is_import(span1, n))
    imports_from_part1 = sorted(n for n in need2 if not _is_import(span1, n))

    body1 = "".join(lines[: starts[cut]])
    body2 = "".join(lines[starts[cut] :])

    # part 1: swap the header docstring
    body1 = re.sub(r'^""".*?"""\n', HEADER1, body1, count=1, flags=re.S)
    open(SRC, "w").write(body1)

    imp = HEADER2 + "\nfrom __future__ import annotations\n"
    if imports_from_shared:
        imp += "\nfrom .shared import (\n"
        imp += "".join(f"    {n},\n" for n in imports_from_shared)
        imp += ")\n"
    if imports_from_part1:
        imp += "from .eval_temporal import (\n"
        imp += "".join(f"    {n},\n" for n in imports_from_part1)
        imp += ")\n"
    open(NEW, "w").write(imp + "\n\n" + body2)

    # rewrite the two downstream import sites: every name in their
    # `from .eval_temporal import (...)` lists that moved to part 2
    for path in (os.path.join(REG, "__init__.py"), os.path.join(REG, "assembly.py")):
        s = open(path).read()
        m = re.search(r"from \.eval_temporal import \(\n(.*?)\)\n", s, re.S)
        assert m, path
        names = [x.strip().rstrip(",") for x in m.group(1).splitlines() if x.strip()]
        stay = [n for n in names if n in def1]
        move = [n for n in names if n in def2 and n not in def1]
        assert set(stay + move) == set(names), (path, names)
        block = "from .eval_temporal import (\n"
        block += "".join(f"    {n},\n" for n in stay)
        block += ")\nfrom .eval_temporal2 import (\n"
        block += "".join(f"    {n},\n" for n in move)
        block += ")\n"
        s = s[: m.start()] + block + s[m.end() :]
        open(path, "w").write(s)

    print(
        f"split at stmt {cut} ({BOUNDARY_SYMBOL}): part1 "
        f"{len(body1.splitlines())} lines / part2 "
        f"{len(body2.splitlines())} lines; part2 pulls "
        f"{len(imports_from_shared)} shared + {len(imports_from_part1)} part1 names"
    )


def _is_import(span, name: str) -> bool:
    for node in span:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if (a.asname or a.name).split(".")[0] == name:
                    return True
    return False


if __name__ == "__main__":
    main()
