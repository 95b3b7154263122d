// App shell: sidebar nav + hash router over the view modules.

import { el, clear } from "./ui.js";
import { getState, subscribe, connectStateWs, refreshAll } from "./store.js";
import { mountMonitor } from "./views/monitor.js";
import { mountTrunking } from "./views/trunking.js";
import { mountScanner } from "./views/scanner.js";
import { mountMessages } from "./views/messages.js";
import { mountRecipes } from "./views/recipes.js";
import { mountDevices } from "./views/devices.js";
import { mountSystem } from "./views/system.js";

const VIEWS = {
  monitor: { label: "Monitor", icon: "📡", mount: mountMonitor },
  trunking: { label: "Trunking", icon: "🗼", mount: mountTrunking },
  scanner: { label: "Scanner", icon: "🔁", mount: mountScanner },
  messages: { label: "Messages", icon: "✉", mount: mountMessages },
  recipes: { label: "Recipes", icon: "📻", mount: mountRecipes },
  devices: { label: "Devices", icon: "🔌", mount: mountDevices },
  system: { label: "System", icon: "🖥", mount: mountSystem },
};

let unmount = null;
let navEl = null;
let contentEl = null;

function currentView() {
  const h = location.hash.replace(/^#\//, "");
  return VIEWS[h] ? h : "monitor";
}

function renderNav() {
  const active = currentView();
  const conn = getState().connected;
  clear(navEl);
  navEl.append(
    el("div", { class: "brand" }, "WaveCap", el("small", {}, "TPU SDR console")),
    ...Object.entries(VIEWS).map(([key, v]) =>
      el("a", { href: `#/${key}`, class: key === active ? "active" : "" },
        el("span", {}, v.icon), v.label)),
    el("div", { class: "conn" },
      el("span", { class: `dot ${conn ? "ok" : ""}` }),
      conn ? "connected" : "disconnected"));
}

function route() {
  unmount?.();
  unmount = null;
  clear(contentEl);
  renderNav();
  unmount = VIEWS[currentView()].mount(contentEl);
}

function boot() {
  const app = document.getElementById("app");
  navEl = el("nav", { class: "side" });
  contentEl = el("main", { class: "content" });
  app.append(navEl, contentEl);
  subscribe((what) => { if (what === "conn") renderNav(); });
  connectStateWs();
  refreshAll();
  window.addEventListener("hashchange", route);
  route();
}

boot();
