#!/usr/bin/env python3
"""Lateral-column-alias capture sweep (VERDICT r15 #1).

The bug class: inside ONE .select(...)/.withColumns(...) projection, an
expression is aliased to a name that ALREADY EXISTS on the input, and a
LATER (or lambda-embedded) item references that name. Spark resolves the
reference laterally — against the new aliased expression, not the input
column — so `select((col("id")+K).as("id"), f(col("id")))` silently binds
f to the SHIFTED id. This sat latent in q_semantic_dedup's fixture for
five rounds (NOTES_r15 §4).

This sweep extracts every parenthesis-balanced `.select(` / `.selectExpr(`
argument list in the Scala sources, collects the set of alias targets
(`.as("x")` / `AS x`) and the set of referenced names (`col("x")`,
`$"x"`, `'x`, bare identifiers in selectExpr strings), and flags any
block where some name is BOTH an alias target AND referenced by another
item of the same projection. Findings are triage candidates, not
confirmed bugs — a reference that appears textually BEFORE the alias in
the list is still flagged (Spark's lateral resolution is list-order-
sensitive only for SQL; the DataFrame API resolves laterally regardless
of position when the name collides).

Usage: python3 tools/alias_capture_sweep.py [srcdir...]
Exit 0 always; findings go to stdout for manual triage.
"""
import re
import sys
import os

ALIAS_RE = re.compile(r'\.(?:as|alias|name)\(\s*"([A-Za-z_][A-Za-z0-9_]*)"\s*\)')
REF_RES = [
    re.compile(r'col\(\s*"([A-Za-z_][A-Za-z0-9_]*)"\s*\)'),
    re.compile(r'\$"([A-Za-z_][A-Za-z0-9_]*)"'),
]


def select_blocks(text):
    """Yield (offset, argtext) for each .select( / .withColumn( call."""
    for m in re.finditer(r'\.(select|selectExpr|withColumn|withColumns)\s*\(', text):
        depth = 1
        i = m.end()
        while i < len(text) and depth:
            c = text[i]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            i += 1
        yield m.start(), m.group(1), text[m.end():i - 1]


def split_top_level(args):
    """Split an argument list on top-level commas."""
    parts, depth, cur = [], 0, []
    for c in args:
        if c in '([{':
            depth += 1
        elif c in ')]}':
            depth -= 1
        if c == ',' and depth == 0:
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append(''.join(cur))
    return parts


def sweep(path):
    text = open(path, encoding='utf-8').read()
    findings = []
    for off, kind, args in select_blocks(text):
        items = split_top_level(args)
        if len(items) < 2:
            continue
        # per-item alias targets and references
        item_alias = [set(ALIAS_RE.findall(it)) for it in items]
        item_refs = [set(r for rx in REF_RES for r in rx.findall(it))
                     for it in items]
        for i, aliases in enumerate(item_alias):
            for a in aliases:
                # is `a` referenced by a DIFFERENT item of the same list?
                for j, refs in enumerate(item_refs):
                    if j != i and a in refs:
                        line = text.count('\n', 0, off) + 1
                        findings.append((line, kind, a, i, j))
    return findings


def main():
    roots = sys.argv[1:] or ['src/main/scala', 'src/test/scala']
    total = 0
    for root in roots:
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if not f.endswith('.scala'):
                    continue
                p = os.path.join(dirpath, f)
                for line, kind, name, i, j in sweep(p):
                    total += 1
                    print(f"{p}:{line} [{kind}] alias '{name}' (item {i}) "
                          f"also referenced by item {j} of the same projection")
    print(f"== {total} candidate site(s) ==")


if __name__ == '__main__':
    main()
