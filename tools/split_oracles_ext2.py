"""One-shot AST-driven pre-split of registry/oracles_ext2.py
(round 9): the second-largest registry part (2,043 lines) grows
~150 lines of oracle SQL per round and would cross the 3,000-line
ceiling within a few rounds; split it at its statement midpoint
BEFORE that happens, exactly as round 9 pre-split eval_temporal
(tools/split_eval_temporal.py).

Module-level `ORACLES[...] = ...` statements execute top-down, so a
contiguous statement cut can never break a reference from the first
span to the second (a forward reference would already have been a
NameError); the only rewrite the new part needs is its own import
block -- the used subset of part 1's imports plus any part-1-defined
helpers. __init__ imports the new part right after oracles_ext2 so
the dict-mutation order is preserved.

Run once; kept in tools/ as the audit trail.
"""

from __future__ import annotations

import ast
import builtins
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "mapreduce_implementation_grpc_spark", "registry")
SRC = os.path.join(REG, "oracles_ext2.py")
NEW = os.path.join(REG, "oracles_ext3.py")

CUT_LINE = 1020  # cut at the first top-level statement at/after this line

HEADER1 = (
    '"""registry part 13: oracles_ext2 (split from the monolithic '
    'registry.py in round 8; pre-split again in round 9 -- see '
    'tools/split_oracles_ext2.py)."""\n'
)
HEADER2 = (
    '"""registry part 13b: oracles_ext3 (round-9 pre-split of '
    'oracles_ext2 before it crossed the 3,000-line ceiling; see '
    'tools/split_oracles_ext2.py). New oracle SQL goes HERE."""\n'
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


def _is_import(span, name: str) -> bool:
    for node in span:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if (a.asname or a.name).split(".")[0] == name:
                    return True
    return False


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = list(tree.body)

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

    cut = next(i for i, n in enumerate(stmts) if n.lineno >= CUT_LINE)
    span1, span2 = stmts[:cut], stmts[cut:]
    def1 = {n for s in span1 for n in stmt_names(s)}
    def2 = {n for s in span2 for n in stmt_names(s)}
    back_refs = used_names(span1) & (def2 - def1)
    assert not back_refs, f"span1 uses span2 names: {sorted(back_refs)}"

    need2 = (used_names(span2) - def2 - set(dir(builtins))) & def1
    # every imported name part 2 needs, re-imported from its true
    # source module (parse part 1's import statements)
    import_src: dict[str, str] = {}
    for node in span1:
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                import_src[(a.asname or a.name)] = "." * node.level + (node.module or "")
    from_imports: dict[str, list[str]] = {}
    from_part1: list[str] = []
    for n in sorted(need2):
        if _is_import(span1, n):
            from_imports.setdefault(import_src[n], []).append(n)
        else:
            from_part1.append(n)

    body1 = "".join(lines[: starts[cut]])
    body2 = "".join(lines[starts[cut] :])
    body1 = re.sub(r'^""".*?"""\n', HEADER1, body1, count=1, flags=re.S)
    open(SRC, "w").write(body1)

    imp = HEADER2 + "\nfrom __future__ import annotations\n\n"
    for mod in sorted(from_imports):
        imp += f"from {mod} import (\n"
        imp += "".join(f"    {n},\n" for n in sorted(from_imports[mod]))
        imp += ")\n"
    if from_part1:
        imp += "from .oracles_ext2 import (\n"
        imp += "".join(f"    {n},\n" for n in from_part1)
        imp += ")\n"
    open(NEW, "w").write(imp + "\n\n" + body2)

    # __init__: rewrite the parenthesized oracles_ext2 import block --
    # names that moved to part 13b import from there (the import also
    # triggers part 13b's ORACLES mutations right after part 13's, so
    # dict-mutation order is preserved)
    init_path = os.path.join(REG, "__init__.py")
    s = open(init_path).read()
    m = re.search(r"from \.oracles_ext2 import \(\n(.*?)\)\n", s, re.S)
    assert m, "no oracles_ext2 import block in __init__"
    names = [x.strip().rstrip(",") for x in m.group(1).splitlines() if x.strip()]
    stay = [n for n in names if n in def1]
    move = [n for n in names if n in def2 and n not in def1]
    assert set(stay + move) == set(names), names
    block = ""
    if stay:
        block += "from .oracles_ext2 import (\n"
        block += "".join(f"    {n},\n" for n in stay)
        block += ")\n"
    else:
        block += "from . import oracles_ext2  # noqa: F401  (part 13: ORACLES mutations)\n"
    block += "from .oracles_ext3 import (\n"
    block += "".join(f"    {n},\n" for n in move)
    block += ")\n"
    s = s[: m.start()] + block + s[m.end() :]
    open(init_path, "w").write(s)

    print(
        f"split at stmt {cut} (line {stmts[cut].lineno}): part1 "
        f"{len(body1.splitlines())} / part2 {len(body2.splitlines())} lines; "
        f"part2 imports {sum(len(v) for v in from_imports.values())} module "
        f"names + {len(from_part1)} part1 names"
    )


if __name__ == "__main__":
    main()
