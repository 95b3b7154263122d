"""The Playwright e2e suite (``e2e/``) cannot execute in this container —
no browser or node runtime exists — so this pins it statically against
the shipped SPA: every text selector, CSS-class selector, and modal field
label the specs use must exist in the served frontend source, and the
web-server command in the config must point at the real entry point.
This keeps the committed browser suite from rotting between the
developer machines that can actually run it."""

import re
from pathlib import Path

REPO = Path(__file__).parent.parent
E2E = REPO / "e2e"
STATIC = REPO / "wavecap_tpu" / "server" / "static"


def spa_source() -> str:
    parts = [(STATIC / "index.html").read_text()]
    for f in sorted(STATIC.glob("js/**/*.js")):
        parts.append(f.read_text())
    # runtime content the fake-driver server serves: "fake0" etc. come
    # from the fake driver's f-string id template
    fake_src = (REPO / "wavecap_tpu" / "devices" / "fake.py").read_text()
    parts.append(fake_src.replace('f"fake{i}"', '"fake0"'))
    return "\n".join(parts)


def css_classes() -> set[str]:
    css = (STATIC / "css" / "app.css").read_text()
    found = set(re.findall(r"\.([\w-]+)", css))
    # classes assigned dynamically in JS count as defined targets too
    for f in sorted(STATIC.glob("js/**/*.js")):
        for m in re.finditer(r'class:\s*[`"]([^`"]+)[`"]', f.read_text()):
            found.update(re.findall(r"[\w-]+", m.group(1)))
    return found


class TestE2eSpecs:
    def test_spec_files_exist(self):
        assert (E2E / "playwright.config.ts").is_file()
        specs = list(E2E.glob("*.spec.ts"))
        assert specs, "no e2e specs committed"

    def test_text_selectors_exist_in_spa(self):
        src = spa_source()
        misses = []
        for spec in E2E.glob("*.spec.ts"):
            for m in re.finditer(r'hasText:\s*"([^"]+)"', spec.read_text()):
                if m.group(1) not in src and not m.group(1).startswith("e2e"):
                    misses.append((spec.name, m.group(1)))
        assert not misses, misses

    def test_class_selectors_exist(self):
        defined = css_classes()
        misses = []
        for spec in E2E.glob("*.spec.ts"):
            for m in re.finditer(r'locator\("((?:\.[\w-]+)+)', spec.read_text()):
                for cls in re.findall(r"\.([\w-]+)", m.group(1)):
                    if cls not in defined:
                        misses.append((spec.name, cls))
        assert not misses, misses

    def test_modal_field_labels_exist(self):
        src = spa_source()
        misses = []
        for spec in E2E.glob("*.spec.ts"):
            for m in re.finditer(
                r'fillModalField\(page,\s*"([^"]+)"', spec.read_text()
            ):
                if m.group(1) not in src:
                    misses.append((spec.name, m.group(1)))
        assert not misses, misses

    def test_webserver_command_targets_real_entrypoint(self):
        cfg = (E2E / "playwright.config.ts").read_text()
        m = re.search(r"python -m ([\w.]+)", cfg)
        assert m and (REPO / Path(*m.group(1).split("."))).is_dir() or (
            REPO / (Path(*m.group(1).split(".")).with_suffix(".py"))
        ).is_file()
        m = re.search(r'url:\s*"http://[^/]+(/[^"]+)"', cfg)
        assert m
        from wavecap_tpu.server.app import AppState, build_router
        from wavecap_tpu.utils.config import config_from_dict

        state = AppState(config_from_dict({"device": {"driver": "fake"}}))
        try:
            router = build_router(state)
            fn, _ = router.find("GET", m.group(1))
            assert fn is not None, f"health url {m.group(1)} has no route"
        finally:
            state.shutdown()
