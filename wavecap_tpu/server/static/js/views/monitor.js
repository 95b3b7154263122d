// Monitor view: captures, live spectrum/waterfall, channel grid with
// tuning, squelch, audio playback and attachments.

import { api } from "../api.js";
import {
  el, clear, fmtHz, badge, smeter, toast, modal, confirmDlg,
} from "../ui.js";
import { getState, subscribe, refreshCaptures } from "../store.js";
import { SpectrumView } from "../spectrum.js";
import { ChannelPlayer } from "../audio.js";

const MODES = ["nbfm", "wbfm", "am", "ssb", "sam", "p25", "dmr"];

const players = new Map();   // chid -> ChannelPlayer (persist across rerenders)
let spectrum = null;         // active SpectrumView
let spectrumCid = null;
let selectedCid = null;

function stopSpectrum() {
  spectrum?.close();
  spectrum = null;
  spectrumCid = null;
}

export function unmountMonitor() {
  stopSpectrum();
  // keep audio playing across tab switches on purpose
}

async function createCaptureDlg() {
  const devices = getState().devices;
  const vals = await modal({
    title: "New capture",
    fields: [
      { name: "centerHz", label: "Center frequency (MHz)", type: "number",
        value: 100, step: "0.001" },
      { name: "sampleRate", label: "Sample rate (Hz)", type: "select",
        value: "2400000",
        options: [
          { value: "800000", label: "800 kHz" },
          { value: "2400000", label: "2.4 MHz" },
          { value: "9600000", label: "9.6 MHz" },
          { value: "10000000", label: "10 MHz" },
        ] },
      ...(devices.length > 1 ? [{
        name: "deviceId", label: "Device", type: "select",
        options: devices.map((d) => ({ value: d.id, label: d.label || d.id })),
      }] : []),
      { name: "autoStart", label: "Start immediately", type: "checkbox", value: true },
    ],
  });
  if (!vals) return;
  try {
    await api.post("/captures", {
      centerHz: vals.centerHz * 1e6,
      sampleRate: Number(vals.sampleRate),
      deviceId: vals.deviceId,
      autoStart: vals.autoStart,
    });
    toast("Capture created");
    refreshCaptures();
  } catch (e) { toast(e.message, true); }
}

async function addChannelDlg(cap, presetHz) {
  const vals = await modal({
    title: "New channel",
    fields: [
      { name: "name", label: "Name", value: "" },
      { name: "mode", label: "Mode", type: "select", value: "nbfm",
        options: MODES.map((m) => ({ value: m })) },
      { name: "frequencyHz", label: "Frequency (MHz)", type: "number",
        value: ((presetHz ?? cap.centerHz) / 1e6).toFixed(4), step: "0.0001" },
      { name: "squelchDb", label: "Squelch (dBFS, blank = open)", type: "number",
        optional: true, value: "" },
    ],
  });
  if (!vals) return;
  try {
    await api.post(`/captures/${cap.id}/channels`, {
      name: vals.name,
      mode: vals.mode,
      frequencyHz: vals.frequencyHz * 1e6,
      ...(vals.squelchDb !== undefined ? { squelchDb: vals.squelchDb } : {}),
    });
    toast("Channel added");
    refreshCaptures();
  } catch (e) { toast(e.message, true); }
}

function channelRow(cap, ch) {
  const playing = players.has(ch.id);
  const playBtn = el("button", {
    class: `small ${playing ? "primary" : ""}`,
    onClick: () => {
      if (players.has(ch.id)) {
        players.get(ch.id).close();
        players.delete(ch.id);
      } else {
        players.set(ch.id, new ChannelPlayer(`/stream/channels/${ch.id}`));
      }
      render();
    },
  }, playing ? "■ Stop" : "▶ Listen");

  const vol = el("input", {
    type: "range", min: 0, max: 1, step: 0.05,
    value: playing ? players.get(ch.id).volume : 1,
    style: "width:70px",
    onInput: (e) => {
      const p = players.get(ch.id);
      if (p) p.volume = Number(e.target.value);
    },
  });

  return el("tr", {},
    el("td", {}, el("span", { class: "mono" }, ch.name || ch.id)),
    el("td", {}, ch.mode),
    el("td", { class: "mono clickable", title: "Retune",
      onClick: async () => {
        const vals = await modal({
          title: `Retune ${ch.name || ch.id}`,
          fields: [{ name: "f", label: "Frequency (MHz)", type: "number",
            value: (ch.frequencyHz / 1e6).toFixed(4), step: "0.0001" }],
          submitLabel: "Tune",
        });
        if (!vals) return;
        try {
          await api.patch(`/channels/${ch.id}`, { frequencyHz: vals.f * 1e6 });
          refreshCaptures();
        } catch (e) { toast(e.message, true); }
      } }, fmtHz(ch.frequencyHz)),
    el("td", {}, smeter(ch.rssiDb)),
    el("td", {}, playBtn, " ", el("span", { class: "vol" }, vol)),
    el("td", {},
      el("button", { class: "small", title: "Decoder attachments",
        onClick: () => attachmentsDlg(ch) }, "⚙"),
      " ",
      el("button", { class: "small danger", onClick: async () => {
        if (!(await confirmDlg(`Delete channel ${ch.name || ch.id}?`))) return;
        players.get(ch.id)?.close();
        players.delete(ch.id);
        await api.del(`/channels/${ch.id}`).catch((e) => toast(e.message, true));
        refreshCaptures();
      } }, "✕")));
}

async function attachmentsDlg(ch) {
  let current = [];
  try { current = await api.get(`/channels/${ch.id}/attachments`); } catch {}
  const kinds = ["rds", "pocsag", "flex", "p25"];
  const active = new Set(current.map((a) => a.kind ?? a));
  const vals = await modal({
    title: `Attachments — ${ch.name || ch.id}`,
    fields: kinds.map((k) => ({
      name: k, label: k.toUpperCase(), type: "checkbox", value: active.has(k),
    })),
    submitLabel: "Apply",
  });
  if (!vals) return;
  for (const k of kinds) {
    try {
      if (vals[k] && !active.has(k))
        await api.post(`/channels/${ch.id}/attachments`, { kind: k });
      else if (!vals[k] && active.has(k))
        await api.del(`/channels/${ch.id}/attachments/${k}`);
    } catch (e) { toast(`${k}: ${e.message}`, true); }
  }
  toast("Attachments updated");
}

function capturePanel(cap) {
  const isSel = cap.id === selectedCid;
  const head = el("h2", {},
    el("span", { class: "clickable", onClick: () => {
      selectedCid = isSel ? null : cap.id;
      render();
    } }, `${isSel ? "▾" : "▸"} Capture ${cap.id}`),
    badge(cap.state),
    el("span", { class: "muted mono" },
      `${fmtHz(cap.centerHz)} @ ${fmtHz(cap.sampleRate)}`),
    el("span", { class: "spacer" }),
    cap.state === "running"
      ? el("button", { class: "small", onClick: () =>
          api.post(`/captures/${cap.id}/stop`).then(refreshCaptures) }, "Stop")
      : el("button", { class: "small primary", onClick: () =>
          api.post(`/captures/${cap.id}/start`).then(refreshCaptures)
            .catch((e) => toast(e.message, true)) }, "Start"),
    el("button", { class: "small", onClick: async () => {
      const vals = await modal({
        title: "Retune capture",
        fields: [{ name: "f", label: "Center (MHz)", type: "number",
          value: (cap.centerHz / 1e6).toFixed(4), step: "0.001" }],
        submitLabel: "Tune",
      });
      if (!vals) return;
      api.patch(`/captures/${cap.id}`, { centerHz: vals.f * 1e6 })
        .then(refreshCaptures).catch((e) => toast(e.message, true));
    } }, "Retune"),
    el("button", { class: "small danger", onClick: async () => {
      if (!(await confirmDlg(`Delete capture ${cap.id}?`))) return;
      if (spectrumCid === cap.id) stopSpectrum();
      await api.del(`/captures/${cap.id}`).catch((e) => toast(e.message, true));
      refreshCaptures();
    } }, "✕"));

  const kids = [head];

  if (isSel) {
    if (cap.state === "running") {
      if (spectrumCid !== cap.id) {
        stopSpectrum();
        spectrum = new SpectrumView(cap.id, {
          onTune: (hz) => addChannelDlg(cap, hz),
          markers: () => {
            const c = getState().captures.find((x) => x.id === cap.id);
            return (c?.channels || []).map((ch) => ({
              freqHz: ch.frequencyHz, name: ch.name || ch.mode,
            }));
          },
        });
        spectrumCid = cap.id;
      }
      kids.push(spectrum.root);
      kids.push(el("div", { class: "spec-legend" },
        el("span", {}, "click trace to add a channel · hover for frequency"),
        el("span", { class: "right" },
          `blocks ${cap.blocksProcessed} · ${cap.blockMs} ms/block · overflow ${cap.overflowCount}`)));
    } else if (spectrumCid === cap.id) {
      stopSpectrum();
    }

    const chans = cap.channels || [];
    kids.push(el("div", { style: "margin-top:10px" },
      chans.length
        ? el("table", {},
            el("thead", {}, el("tr", {},
              el("th", {}, "Name"), el("th", {}, "Mode"),
              el("th", {}, "Frequency"), el("th", {}, "Signal"),
              el("th", {}, "Audio"), el("th", {}, ""))),
            el("tbody", {}, chans.map((ch) => channelRow(cap, ch))))
        : el("div", { class: "empty" }, "No channels — click the spectrum or Add channel"),
      el("div", { style: "margin-top:8px" },
        el("button", { class: "small", onClick: () => addChannelDlg(cap) },
          "+ Add channel"))));
  }

  return el("div", { class: "panel" }, kids);
}

let rootEl = null;
let unsub = null;

function render() {
  if (!rootEl) return;
  const caps = getState().captures;
  if (selectedCid === null && caps.length) selectedCid = caps[0].id;
  clear(rootEl);
  rootEl.append(
    el("div", { class: "toolbar" },
      el("h1", { style: "margin:0" }, "Monitor"),
      el("span", { class: "right" }),
      el("button", { class: "primary", onClick: createCaptureDlg }, "+ New capture")),
    caps.length
      ? el("div", {}, caps.map(capturePanel))
      : el("div", { class: "empty" },
          "No captures. Create one, or apply a recipe from the Recipes tab."));
}

export function mountMonitor(container) {
  rootEl = container;
  unsub?.();
  unsub = subscribe((what) => {
    if (what === "captures" || what === "devices") render();
  });
  render();
  return () => { unsub?.(); unsub = null; unmountMonitor(); rootEl = null; };
}
