// Trunking view: P25 systems, control-channel status, calls, talkgroups,
// live event feed and voice audio.

import { api, openWs } from "../api.js";
import {
  el, clear, fmtHz, fmtTime, badge, toast, modal, confirmDlg,
} from "../ui.js";
import { getState, subscribe, refreshTrunking } from "../store.js";
import { ChannelPlayer } from "../audio.js";

let rootEl = null;
let unsub = null;
let selectedSid = null;
let eventsWs = null;
const eventLog = [];
let voicePlayer = null;
let voiceSid = null;
let detail = { calls: null, talkgroups: null, locations: null, fetched: 0 };

function stopVoice() {
  voicePlayer?.close();
  voicePlayer = null;
  voiceSid = null;
}

async function createSystemDlg() {
  const vals = await modal({
    title: "New trunking system",
    fields: [
      { name: "id", label: "System id", value: "sys1" },
      { name: "name", label: "Name", value: "" },
      { name: "ccs", label: "Control channels (MHz, comma-separated)",
        value: "851.2625" },
      { name: "sampleRate", label: "Sample rate (Hz)", type: "select",
        value: "2400000",
        options: [
          { value: "960000", label: "960 kHz" },
          { value: "2400000", label: "2.4 MHz" },
          { value: "9600000", label: "9.6 MHz" },
        ] },
      { name: "start", label: "Start immediately", type: "checkbox", value: true },
    ],
  });
  if (!vals) return;
  const ccs = vals.ccs.split(",").map((s) => Number(s.trim()) * 1e6)
    .filter((v) => isFinite(v) && v > 0);
  if (!ccs.length) { toast("no valid control channels", true); return; }
  try {
    await api.post("/trunking/systems", {
      id: vals.id, name: vals.name, control_channels: ccs,
      sample_rate: Number(vals.sampleRate),
    });
    if (vals.start) await api.post(`/trunking/systems/${vals.id}/start`);
    toast("System created");
    refreshTrunking();
  } catch (e) { toast(e.message, true); }
}

function callsTable(calls) {
  const act = calls?.active || [];
  const hist = calls?.history || [];
  return el("div", {},
    el("h2", {}, "Active calls"),
    act.length
      ? el("table", {},
          el("thead", {}, el("tr", {},
            el("th", {}, "Talkgroup"), el("th", {}, "Source"),
            el("th", {}, "Frequency"), el("th", {}, "Started"))),
          el("tbody", {}, act.map((c) => el("tr", {},
            el("td", {}, `${c.talkgroup || ""} (${c.tgid})`),
            el("td", { class: "mono" }, c.sourceId ?? "—"),
            el("td", { class: "mono" }, fmtHz(c.frequencyHz)),
            el("td", {}, fmtTime(c.startTime))))))
      : el("div", { class: "empty" }, "No active calls"),
    el("h2", { style: "margin-top:12px" }, "Call history"),
    hist.length
      ? el("table", {},
          el("thead", {}, el("tr", {},
            el("th", {}, "Talkgroup"), el("th", {}, "Source"),
            el("th", {}, "Frequency"), el("th", {}, "Start"),
            el("th", { class: "num" }, "Voice frames"))),
          el("tbody", {}, hist.map((c) => el("tr", {},
            el("td", {}, `${c.talkgroup || ""} (${c.tgid})`),
            el("td", { class: "mono" }, c.sourceId ?? "—"),
            el("td", { class: "mono" }, fmtHz(c.frequencyHz)),
            el("td", {}, fmtTime(c.startTime)),
            el("td", { class: "num" }, c.imbeFrames ?? 0)))))
      : el("div", { class: "empty" }, "No completed calls yet"));
}

function tgTable(tgs) {
  if (!tgs?.length) return el("div", { class: "empty" }, "No talkgroups configured");
  return el("table", {},
    el("thead", {}, el("tr", {},
      el("th", {}, "TGID"), el("th", {}, "Name"), el("th", {}, "Category"),
      el("th", { class: "num" }, "Priority"), el("th", {}, "Record"))),
    el("tbody", {}, tgs.map((t) => el("tr", {},
      el("td", { class: "mono" }, t.tgid),
      el("td", {}, t.name),
      el("td", {}, t.category || "—"),
      el("td", { class: "num" }, t.priority),
      el("td", {}, t.record ? "yes" : "no")))));
}

function locTable(locs) {
  if (!locs?.length) return el("div", { class: "empty" }, "No GPS reports (LRRP)");
  return el("table", {},
    el("thead", {}, el("tr", {},
      el("th", {}, "Unit"), el("th", {}, "Latitude"), el("th", {}, "Longitude"),
      el("th", { class: "num" }, "Speed km/h"), el("th", {}, "Time"))),
    el("tbody", {}, locs.map((l) => el("tr", {},
      el("td", { class: "mono" }, l.unitId),
      el("td", { class: "mono" }, l.latitude?.toFixed(5)),
      el("td", { class: "mono" }, l.longitude?.toFixed(5)),
      el("td", { class: "num" }, l.speedKmh?.toFixed(0) ?? "—"),
      el("td", {}, fmtTime(l.time))))));
}

function systemDetail(sys) {
  const tiles = el("div", { class: "tiles" },
    el("div", { class: "tile" },
      el("div", { class: "v" }, fmtHz(sys.controlChannelHz)),
      el("div", { class: "k" }, "Control channel")),
    el("div", { class: "tile" },
      el("div", { class: "v" }, sys.synced ? "Locked" : "Hunting"),
      el("div", { class: "k" }, "CC sync")),
    el("div", { class: "tile" },
      el("div", { class: "v mono" },
        sys.nac !== null && sys.nac !== undefined
          ? "0x" + sys.nac.toString(16).toUpperCase() : "—"),
      el("div", { class: "k" }, "NAC")),
    el("div", { class: "tile" },
      el("div", { class: "v mono" }, sys.systemId ?? "—"),
      el("div", { class: "k" }, "System")),
    el("div", { class: "tile" },
      el("div", { class: "v mono" },
        `${sys.rfssId ?? "—"}/${sys.siteId ?? "—"}`),
      el("div", { class: "k" }, "RFSS / site")),
    el("div", { class: "tile" },
      el("div", { class: "v" }, sys.tsbkCount ?? 0),
      el("div", { class: "k" }, "TSBKs")),
    el("div", { class: "tile" },
      el("div", { class: "v" },
        `${((sys.tsbkCrcRate ?? 0) * 100).toFixed(1)}%`),
      el("div", { class: "k" }, "CRC pass")));

  const voiceOn = voiceSid === sys.id;
  const voiceBtn = el("button", {
    class: `small ${voiceOn ? "primary" : ""}`,
    onClick: () => {
      if (voiceOn) stopVoice();
      else {
        stopVoice();
        voicePlayer = new ChannelPlayer(`/trunking/stream/${sys.id}/voice`,
          { rate: 8000 });
        voiceSid = sys.id;
      }
      render();
    },
  }, voiceOn ? "■ Voice on (stop)" : "▶ Listen to calls");

  const adj = sys.adjacentSites || [];
  const ccm = sys.ccMeasurements || [];

  return el("div", {},
    tiles,
    el("div", { style: "margin-bottom:12px" }, voiceBtn),
    el("div", { class: "row" },
      el("div", { class: "panel" }, callsTable(detail.calls)),
      el("div", { class: "panel" },
        el("h2", {}, "Talkgroups"), tgTable(detail.talkgroups),
        el("h2", { style: "margin-top:12px" }, "Locations"),
        locTable(detail.locations))),
    el("div", { class: "row" },
      el("div", { class: "panel" },
        el("h2", {}, "Control-channel candidates"),
        ccm.length
          ? el("table", {},
              el("thead", {}, el("tr", {},
                el("th", {}, "Frequency"), el("th", { class: "num" }, "Power"),
                el("th", { class: "num" }, "SNR"), el("th", {}, "Sync"))),
              el("tbody", {}, ccm.map((m) => el("tr", {},
                el("td", { class: "mono" }, fmtHz(m.frequencyHz ?? m.freq_hz)),
                el("td", { class: "num" },
                  (m.powerDb ?? m.power_db)?.toFixed?.(1) ?? "—"),
                el("td", { class: "num" },
                  (m.snrDb ?? m.snr_db)?.toFixed?.(1) ?? "—"),
                el("td", {}, (m.syncOk ?? m.sync_ok) ? "✓" : "—")))))
          : el("div", { class: "empty" }, "No measurements yet"),
        adj.length ? el("div", {},
          el("h2", { style: "margin-top:12px" }, "Adjacent sites"),
          el("div", { class: "mono sec" },
            adj.map((a) => JSON.stringify(a)).join("\n"))) : null),
      el("div", { class: "panel" },
        el("h2", {}, "Event feed"),
        el("div", { class: "logbox", id: "tk-events" },
          eventLog.slice(-200).map((e) =>
            `${fmtTime(e.time)}  ${e.type ?? ""}  ${JSON.stringify(e)}`)
            .join("\n")))));
}

async function fetchDetail(sid) {
  const now = Date.now();
  if (now - detail.fetched < 2000) return;
  detail.fetched = now;
  try {
    const [calls, tgs, locs] = await Promise.all([
      api.get(`/trunking/systems/${sid}/calls`),
      api.get(`/trunking/systems/${sid}/talkgroups`),
      api.get(`/trunking/systems/${sid}/locations`),
    ]);
    detail.calls = calls;
    detail.talkgroups = tgs;
    detail.locations = locs;
    render();
  } catch { /* system may be starting */ }
}

function render() {
  if (!rootEl) return;
  const systems = getState().trunking;
  if (selectedSid === null && systems.length) selectedSid = systems[0].id;
  const sel = systems.find((s) => s.id === selectedSid);
  clear(rootEl);
  rootEl.append(
    el("div", { class: "toolbar" },
      el("h1", { style: "margin:0" }, "Trunking"),
      el("span", { class: "right" }),
      el("button", { class: "primary", onClick: createSystemDlg }, "+ New system")),
    systems.length
      ? el("div", { class: "panel" },
          el("table", {},
            el("thead", {}, el("tr", {},
              el("th", {}, "System"), el("th", {}, "State"),
              el("th", {}, "Protocol"), el("th", {}, "Control"),
              el("th", {}, "Sync"), el("th", {}, ""))),
            el("tbody", {}, systems.map((s) => el("tr", {
              class: "clickable",
              style: s.id === selectedSid ? "outline:1px solid var(--accent)" : "",
              onClick: () => { selectedSid = s.id; detail.fetched = 0; render(); },
            },
              el("td", {}, s.name || s.id),
              el("td", {}, badge(s.state)),
              el("td", {}, s.protocol),
              el("td", { class: "mono" }, fmtHz(s.controlChannelHz)),
              el("td", {}, s.synced ? badge("locked") : badge("hunting")),
              el("td", {},
                s.state === "running"
                  ? el("button", { class: "small", onClick: (e) => {
                      e.stopPropagation();
                      api.post(`/trunking/systems/${s.id}/stop`).then(refreshTrunking);
                    } }, "Stop")
                  : el("button", { class: "small primary", onClick: (e) => {
                      e.stopPropagation();
                      api.post(`/trunking/systems/${s.id}/start`)
                        .then(refreshTrunking).catch((er) => toast(er.message, true));
                    } }, "Start"),
                " ",
                el("button", { class: "small danger", onClick: async (e) => {
                  e.stopPropagation();
                  if (!(await confirmDlg(`Delete system ${s.id}?`))) return;
                  if (voiceSid === s.id) stopVoice();
                  await api.del(`/trunking/systems/${s.id}`)
                    .catch((er) => toast(er.message, true));
                  selectedSid = null;
                  refreshTrunking();
                } }, "✕")))))))
      : el("div", { class: "empty" },
          "No trunking systems. Create one or apply a P25 recipe."),
    sel ? systemDetail(sel) : null);
  if (sel) fetchDetail(sel.id);
}

export function mountTrunking(container) {
  rootEl = container;
  unsub?.();
  unsub = subscribe((what) => {
    if (what === "trunking") render();
  });
  if (!eventsWs) {
    eventsWs = openWs("/trunking/stream", {
      json: (evt) => {
        eventLog.push(evt);
        if (eventLog.length > 500) eventLog.splice(0, eventLog.length - 500);
        const box = document.getElementById("tk-events");
        if (box) {
          box.textContent += "\n" +
            `${fmtTime(evt.time)}  ${evt.type ?? ""}  ${JSON.stringify(evt)}`;
          box.scrollTop = box.scrollHeight;
        }
      },
    });
  }
  render();
  return () => {
    unsub?.(); unsub = null;
    rootEl = null;
    // keep events WS + voice running across tab switches
  };
}
