// Messages view: decoded POCSAG / FLEX / RDS traffic across all channels.

import { api } from "../api.js";
import { el, clear, fmtTime } from "../ui.js";
import { getState } from "../store.js";

let rootEl = null;
let timer = null;
let rows = [];
let filter = "all";

async function fetchAll() {
  const caps = getState().captures;
  const chans = caps.flatMap((c) => c.channels || []);
  const out = [];
  await Promise.allSettled(chans.map(async (ch) => {
    try {
      const msgs = await api.get(`/channels/${ch.id}/messages?limit=100`);
      for (const m of msgs) out.push({ channel: ch.name || ch.id, ...m });
    } catch { /* channel may be gone */ }
  }));
  out.sort((a, b) => (b.time || 0) - (a.time || 0));
  rows = out.slice(0, 300);
  render();
}

function render() {
  if (!rootEl) return;
  const kinds = ["all", ...new Set(rows.map((r) => r.decoder))];
  const shown = filter === "all" ? rows : rows.filter((r) => r.decoder === filter);
  clear(rootEl);
  rootEl.append(
    el("div", { class: "toolbar" },
      el("h1", { style: "margin:0" }, "Messages"),
      el("span", { class: "right" }),
      el("select", { onChange: (e) => { filter = e.target.value; render(); } },
        ...kinds.map((k) =>
          el("option", { value: k, selected: k === filter }, k)))),
    el("div", { class: "panel" },
      shown.length
        ? el("table", {},
            el("thead", {}, el("tr", {},
              el("th", {}, "Time"), el("th", {}, "Channel"),
              el("th", {}, "Decoder"), el("th", {}, "Address"),
              el("th", {}, "Message"))),
            el("tbody", {}, shown.map((m) => el("tr", {},
              el("td", {}, fmtTime(m.time)),
              el("td", {}, m.channel),
              el("td", {}, m.decoder),
              el("td", { class: "mono" },
                m.alias || m.address || m.capcode || m.station || "—"),
              el("td", { class: "mono", style: "max-width:480px; overflow-wrap:anywhere" },
                m.text || m.message || m.radiotext || JSON.stringify(m))))))
        : el("div", { class: "empty" },
            "No decoded messages yet. Enable POCSAG / FLEX / RDS attachments on a channel.")));
}

export function mountMessages(container) {
  rootEl = container;
  fetchAll();
  timer = setInterval(fetchAll, 4000);
  render();
  return () => { clearInterval(timer); timer = null; rootEl = null; };
}
