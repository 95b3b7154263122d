// System view: metrics tiles, live log tail, recent errors, config dump.

import { api, openWs } from "../api.js";
import { el, clear, fmtDur, toast } from "../ui.js";

let rootEl = null;
let metrics = null;
let errors = null;
let timer = null;
let logsWs = null;
const logLines = [];

async function fetchAll() {
  try { metrics = await api.get("/system/metrics"); } catch { metrics = null; }
  try { errors = await api.get("/errors"); } catch { errors = null; }
  render();
}

function tile(v, k) {
  return el("div", { class: "tile" },
    el("div", { class: "v" }, v), el("div", { class: "k" }, k));
}

function render() {
  if (!rootEl) return;
  clear(rootEl);
  const m = metrics || {};
  const capEntries = Object.entries(m.captures || {});
  rootEl.append(
    el("h1", {}, "System"),
    el("div", { class: "tiles" },
      tile(fmtDur(m.uptimeS), "Uptime"),
      tile(m.cpuPercent !== undefined ? `${m.cpuPercent.toFixed(0)}%` : "—", "CPU"),
      tile(m.memory?.percent !== undefined ? `${m.memory.percent.toFixed(0)}%` : "—",
        "Memory"),
      tile(capEntries.length, "Captures"),
      tile(capEntries.reduce((s, [, c]) => s + (c.blocksProcessed || 0), 0),
        "Blocks processed")),
    el("div", { class: "row" },
      el("div", { class: "panel" },
        el("h2", {}, "Live log",
          el("span", { class: "spacer" }),
          el("button", { class: "small", onClick: () => {
            logLines.length = 0;
            render();
          } }, "Clear")),
        el("div", { class: "logbox", id: "sys-logs" },
          logLines.slice(-400).join("\n"))),
      el("div", { class: "panel" },
        el("h2", {}, "Recent errors"),
        errors && (errors.recent?.length || errors.length)
          ? el("div", { class: "logbox" },
              JSON.stringify(errors, null, 1))
          : el("div", { class: "empty" }, "No errors recorded"),
        el("h2", { style: "margin-top:12px" }, "Maintenance"),
        el("div", { style: "display:flex; gap:8px" },
          el("button", { onClick: () =>
            api.post("/config/reload").then(() => toast("Config reloaded"))
              .catch((e) => toast(e.message, true)) }, "Reload config"),
          el("button", { onClick: async () => {
            try {
              const cfg = await api.get("/config");
              const w = window.open("", "_blank");
              w.document.write("<pre>" +
                JSON.stringify(cfg, null, 2).replace(/</g, "&lt;") + "</pre>");
            } catch (e) { toast(e.message, true); }
          } }, "View config")))));
}

export function mountSystem(container) {
  rootEl = container;
  fetchAll();
  timer = setInterval(fetchAll, 5000);
  if (!logsWs) {
    logsWs = openWs("/stream/logs", {
      json: (rec) => {
        const lvl = (rec.level || "").toLowerCase();
        const line = `${rec.time ?? ""} ${rec.level ?? ""} ${rec.logger ?? ""}  ${rec.message ?? JSON.stringify(rec)}`;
        logLines.push(line);
        if (logLines.length > 800) logLines.splice(0, 200);
        const box = document.getElementById("sys-logs");
        if (box) {
          box.textContent = logLines.slice(-400).join("\n");
          box.scrollTop = box.scrollHeight;
        }
      },
    });
  }
  render();
  return () => {
    clearInterval(timer); timer = null;
    rootEl = null;
    // keep the log WS alive so history accumulates
  };
}
