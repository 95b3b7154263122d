"""Frontend asset integrity: the SPA's ES-module graph must be servable.

No JS engine exists in this image, so this pins what we can statically:
every module reachable from index.html resolves to a real file, braces/
parens/brackets balance outside strings, and the API paths referenced by
the frontend exist in the router table.
"""

import re
from pathlib import Path

import pytest

STATIC = Path(__file__).parent.parent / "wavecap_tpu" / "server" / "static"


def js_modules():
    index = (STATIC / "index.html").read_text()
    entry = re.search(r'src="/static/(js/[\w./-]+)"', index)
    assert entry, "index.html must reference the JS entry module"
    seen: dict[str, Path] = {}
    stack = [STATIC / entry.group(1)]
    while stack:
        f = stack.pop()
        key = str(f.resolve())
        if key in seen:
            continue
        assert f.is_file(), f"missing module {f}"
        seen[key] = f
        for m in re.finditer(r'from\s+"(\.[\w./-]+)"', f.read_text()):
            stack.append((f.parent / m.group(1)).resolve())
    return list(seen.values())


def strip_strings(src: str) -> str:
    # remove string/template/comment contents so brackets inside don't count;
    # regex literals (after ( , = :) go first or their escapes read as comments
    src = re.sub(r"([(,=:]\s*)/(?:[^/\\\n]|\\.)+/[a-z]*", r"\1''", src)
    src = re.sub(r"//[^\n]*", "", src)
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r'"(?:[^"\\\n]|\\.)*"', '""', src)
    src = re.sub(r"'(?:[^'\\\n]|\\.)*'", "''", src)
    src = re.sub(r"`(?:[^`\\]|\\.)*`", "``", src)
    return src


class TestFrontendAssets:
    def test_import_graph_resolves(self):
        mods = js_modules()
        assert len(mods) >= 12, [m.name for m in mods]

    @pytest.mark.parametrize("f", js_modules(), ids=lambda f: f.name)
    def test_brackets_balance(self, f):
        src = strip_strings(f.read_text())
        pairs = {"(": ")", "[": "]", "{": "}"}
        stack = []
        for i, c in enumerate(src):
            if c in pairs:
                stack.append((c, i))
            elif c in pairs.values():
                assert stack, f"{f.name}: unmatched {c!r} at {i}"
                o, _ = stack.pop()
                assert pairs[o] == c, f"{f.name}: mismatched {o!r}...{c!r} at {i}"
        assert not stack, f"{f.name}: unclosed {stack[-1]}"

    def test_named_imports_are_exported(self):
        """Every `import {a, b} from "./x.js"` name must be exported by
        x.js — the most common runtime breakage a vanilla ES-module SPA
        can ship, caught statically since no JS engine exists here."""
        export_re = re.compile(
            r"export\s+(?:async\s+)?(?:function|class|const|let)\s+(\w+)")
        misses = []
        for f in js_modules():
            src = f.read_text()
            for m in re.finditer(
                r'import\s*\{([^}]+)\}\s*from\s*"(\.[\w./-]+)"', src
            ):
                names = [
                    n.split(" as ")[0].strip()
                    for n in m.group(1).split(",") if n.strip()
                ]
                target = (f.parent / m.group(2)).resolve()
                exported = set(export_re.findall(target.read_text()))
                for n in names:
                    if n not in exported:
                        misses.append((f.name, n, target.name))
        assert not misses, misses

    def test_css_classes_used_are_defined(self):
        """Classes the JS assigns (class: "...") must exist in app.css —
        catches dead styling after a rename. Only single-class literals
        are checked; dynamic/composite class strings are skipped."""
        css = (STATIC / "css" / "app.css").read_text()
        defined = set(re.findall(r"\.([\w-]+)", css))
        misses = []
        for f in js_modules():
            for m in re.finditer(r'class:\s*"([\w-]+)"', f.read_text()):
                cls = m.group(1)
                if cls not in defined:
                    misses.append((f.name, cls))
        assert not misses, misses

    def test_css_served_name_matches(self):
        index = (STATIC / "index.html").read_text()
        m = re.search(r'href="/static/(css/[\w./-]+)"', index)
        assert m and (STATIC / m.group(1)).is_file()

    def test_api_paths_exist_in_router(self):
        """Every literal /api path string the frontend uses has a route."""
        from wavecap_tpu.server.app import AppState, build_router
        from wavecap_tpu.utils.config import config_from_dict

        state = AppState(config_from_dict({"device": {"driver": "fake"}}))
        router = build_router(state)
        methods = {"get": "GET", "post": "POST", "patch": "PATCH",
                   "put": "PUT", "del": "DELETE"}
        misses = []
        for f in js_modules():
            src = f.read_text()
            for m in re.finditer(
                r'api\.(get|post|patch|put|del)\(\s*[`"](/[^`"?]+)', src
            ):
                verb, path = m.group(1), m.group(2)
                # substitute JS template params with a plausible id
                path = re.sub(r"\$\{[^}]+\}", "x", path)
                fn, _ = router.find(methods[verb], "/api/v1" + path)
                if fn is None:
                    misses.append((f.name, verb, path))
            for m in re.finditer(r'openWs\(\s*[`"](/[^`"?]+)', src):
                path = re.sub(r"\$\{[^}]+\}", "x", m.group(1))
                fn, _ = router.find_ws("/api/v1" + path)
                if fn is None:
                    misses.append((f.name, "ws", path))
        state.shutdown()
        assert not misses, misses
