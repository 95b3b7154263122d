// Spectrum analyzer + waterfall on <canvas>, fed by the spectrum WS.
//
// Colormap: single-hue sequential (the palette's blue ramp, dark surface):
// near-noise-floor recedes to the surface, strong signal brightens —
// magnitude is one hue light->dark per the color formula.

import { openWs } from "./api.js";
import { el, clear, fmtHz } from "./ui.js";

// blue sequential ramp, surface -> step700 -> ... -> step100 (bright = hot)
const RAMP = [
  "#121211", "#0d366b", "#104281", "#184f95", "#1c5cab", "#256abf",
  "#2a78d6", "#3987e5", "#5598e7", "#6da7ec", "#86b6ef", "#9ec5f4",
  "#b7d3f6", "#cde2fb",
];

function buildLut() {
  const lut = new Uint8Array(256 * 3);
  const stops = RAMP.map((h) => [
    parseInt(h.slice(1, 3), 16),
    parseInt(h.slice(3, 5), 16),
    parseInt(h.slice(5, 7), 16),
  ]);
  for (let i = 0; i < 256; i++) {
    const t = (i / 255) * (stops.length - 1);
    const a = Math.floor(t), b = Math.min(a + 1, stops.length - 1);
    const f = t - a;
    for (let c = 0; c < 3; c++)
      lut[i * 3 + c] = Math.round(stops[a][c] * (1 - f) + stops[b][c] * f);
  }
  return lut;
}
const LUT = buildLut();

const SPEC_H = 160;
const FALL_H = 220;

export class SpectrumView {
  /**
   * opts: {onTune(freqHz), markers: () => [{freqHz, name, color}]}
   */
  constructor(captureId, opts = {}) {
    this.opts = opts;
    this.centerHz = 0;
    this.sampleRate = 1;
    this.dbMin = -110;
    this.dbMax = -20;
    this.spec = el("canvas", { height: SPEC_H, class: "clickable" });
    this.fall = el("canvas", { height: FALL_H, class: "clickable" });
    this.label = null;
    this.root = el("div", { class: "spectrum-wrap" }, this.spec, this.fall);
    this.root.style.display = "flex";
    this.root.style.flexDirection = "column";
    this.root.style.gap = "4px";

    const hover = (e) => this._hover(e);
    const leave = () => { this.label?.remove(); this.label = null; };
    const click = (e) => {
      const hz = this._freqAt(e);
      if (hz !== null && this.opts.onTune) this.opts.onTune(hz);
    };
    for (const cv of [this.spec, this.fall]) {
      cv.addEventListener("mousemove", hover);
      cv.addEventListener("mouseleave", leave);
      cv.addEventListener("click", click);
    }

    this.ws = openWs(`/stream/captures/${captureId}/spectrum`, {
      json: (msg) => { if (msg.type === "spectrum") this._frame(msg); },
    });
  }

  _freqAt(e) {
    const cv = e.target;
    const rect = cv.getBoundingClientRect();
    const frac = (e.clientX - rect.left) / rect.width;
    if (frac < 0 || frac > 1 || !this.sampleRate) return null;
    return this.centerHz + (frac - 0.5) * this.sampleRate;
  }

  _hover(e) {
    const hz = this._freqAt(e);
    if (hz === null) return;
    if (!this.label) {
      this.label = el("span", { class: "freq-label" });
      this.root.append(this.label);
    }
    const rect = this.root.getBoundingClientRect();
    this.label.textContent = fmtHz(hz);
    this.label.style.left = `${e.clientX - rect.left}px`;
    this.label.style.top = `${e.clientY - rect.top - 28}px`;
  }

  _frame(msg) {
    this.centerHz = msg.centerHz;
    this.sampleRate = msg.sampleRate;
    const db = msg.db;
    const n = db.length;
    const wCss = this.root.clientWidth || 640;
    if (this.spec.width !== wCss) {
      this.spec.width = wCss;
      this.fall.width = wCss;
      this._fallCtx = null;
    }
    // autorange with slow decay
    let lo = Infinity, hi = -Infinity;
    for (const v of db) { if (v < lo) lo = v; if (v > hi) hi = v; }
    if (isFinite(lo)) {
      this.dbMin += (lo - 4 - this.dbMin) * 0.08;
      this.dbMax += (hi + 8 - this.dbMax) * 0.08;
    }
    this._drawSpec(db, n);
    this._drawFall(db, n);
  }

  _drawSpec(db, n) {
    const ctx = this.spec.getContext("2d");
    const w = this.spec.width, h = this.spec.height;
    const css = getComputedStyle(document.documentElement);
    ctx.fillStyle = css.getPropertyValue("--surface-0").trim() || "#121211";
    ctx.fillRect(0, 0, w, h);

    const y = (v) =>
      h - ((v - this.dbMin) / Math.max(this.dbMax - this.dbMin, 1)) * (h - 8) - 4;

    // recessive grid: horizontal dB lines every 20 dB
    ctx.strokeStyle = "rgba(195,194,183,0.12)";
    ctx.fillStyle = "rgba(138,137,127,0.85)";
    ctx.font = "10px monospace";
    ctx.lineWidth = 1;
    const start = Math.ceil(this.dbMin / 20) * 20;
    for (let g = start; g < this.dbMax; g += 20) {
      const gy = y(g);
      ctx.beginPath();
      ctx.moveTo(0, gy);
      ctx.lineTo(w, gy);
      ctx.stroke();
      ctx.fillText(`${g.toFixed(0)}`, 4, gy - 2);
    }

    // channel markers under the trace
    const markers = this.opts.markers ? this.opts.markers() : [];
    for (const m of markers) {
      const frac = (m.freqHz - this.centerHz) / this.sampleRate + 0.5;
      if (frac < 0 || frac > 1) continue;
      const x = frac * w;
      ctx.strokeStyle = "rgba(217,89,38,0.65)"; // series-2 orange
      ctx.beginPath();
      ctx.moveTo(x, 0);
      ctx.lineTo(x, h);
      ctx.stroke();
      if (m.name) {
        ctx.fillStyle = "rgba(217,89,38,0.9)";
        ctx.fillText(m.name.slice(0, 14), Math.min(x + 3, w - 60), 12);
      }
    }

    // trace: 2px line, series blue
    ctx.strokeStyle = "#3987e5";
    ctx.lineWidth = 2;
    ctx.beginPath();
    for (let i = 0; i < n; i++) {
      const x = (i / (n - 1)) * w;
      const yy = y(db[i]);
      if (i === 0) ctx.moveTo(x, yy);
      else ctx.lineTo(x, yy);
    }
    ctx.stroke();
  }

  _drawFall(db, n) {
    const ctx = this.fall.getContext("2d");
    const w = this.fall.width, h = this.fall.height;
    if (!this._fallCtx) {
      ctx.fillStyle = "#121211";
      ctx.fillRect(0, 0, w, h);
      this._fallCtx = ctx;
      this._row = ctx.createImageData(w, 1);
    }
    // scroll down 1px
    ctx.drawImage(this.fall, 0, 0, w, h - 1, 0, 1, w, h - 1);
    const row = this._row;
    const span = Math.max(this.dbMax - this.dbMin, 1);
    for (let x = 0; x < w; x++) {
      const i = Math.min(n - 1, Math.round((x / (w - 1)) * (n - 1)));
      let t = (db[i] - this.dbMin) / span;
      t = Math.max(0, Math.min(1, t));
      const li = Math.round(t * 255) * 3;
      row.data[x * 4] = LUT[li];
      row.data[x * 4 + 1] = LUT[li + 1];
      row.data[x * 4 + 2] = LUT[li + 2];
      row.data[x * 4 + 3] = 255;
    }
    ctx.putImageData(row, 0, 0);
  }

  close() {
    this.ws.close();
    clear(this.root);
  }
}
