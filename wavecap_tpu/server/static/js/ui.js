// Tiny DOM helpers: element builder, formatting, modal, toast.

export function el(tag, attrs = {}, ...children) {
  const node = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs)) {
    if (k === "class") node.className = v;
    else if (k === "dataset") Object.assign(node.dataset, v);
    else if (k.startsWith("on") && typeof v === "function")
      node.addEventListener(k.slice(2).toLowerCase(), v);
    else if (v !== undefined && v !== null && v !== false)
      node.setAttribute(k, v === true ? "" : v);
  }
  for (const c of children.flat()) {
    if (c === null || c === undefined || c === false) continue;
    node.append(c instanceof Node ? c : document.createTextNode(String(c)));
  }
  return node;
}

export function clear(node) {
  while (node.firstChild) node.removeChild(node.firstChild);
  return node;
}

export function fmtHz(hz) {
  if (hz === null || hz === undefined) return "—";
  const v = Number(hz);
  if (Math.abs(v) >= 1e9) return (v / 1e9).toFixed(4) + " GHz";
  if (Math.abs(v) >= 1e6) return (v / 1e6).toFixed(4) + " MHz";
  if (Math.abs(v) >= 1e3) return (v / 1e3).toFixed(1) + " kHz";
  return v.toFixed(0) + " Hz";
}

export function fmtDb(db) {
  if (db === null || db === undefined || db <= -199) return "—";
  return db.toFixed(1) + " dB";
}

export function fmtDur(s) {
  if (s === null || s === undefined) return "—";
  s = Math.round(s);
  if (s < 60) return s + "s";
  if (s < 3600) return `${Math.floor(s / 60)}m ${s % 60}s`;
  return `${Math.floor(s / 3600)}h ${Math.floor((s % 3600) / 60)}m`;
}

export function fmtTime(t) {
  if (!t) return "—";
  return new Date(t * 1000).toLocaleTimeString();
}

export function badge(state) {
  return el("span", { class: `badge ${state || ""}` }, state || "?");
}

// S-meter: sequential fill mapped -120..-20 dBFS, with dB text (not color-alone)
export function smeter(db) {
  const pct = db === null || db === undefined || db <= -199
    ? 0
    : Math.max(0, Math.min(100, ((db + 120) / 100) * 100));
  return el("span", { class: "smeter" },
    el("span", { class: "bar" },
      el("span", { class: "fill", style: `width:${pct}%` })),
    el("span", { class: "db" }, fmtDb(db)));
}

export function toast(msg, isError = false) {
  let box = document.getElementById("toasts");
  if (!box) {
    box = el("div", { id: "toasts" });
    document.body.append(box);
  }
  const t = el("div", { class: `toast ${isError ? "error" : ""}` }, msg);
  box.append(t);
  setTimeout(() => t.remove(), isError ? 7000 : 3500);
}

// modal({title, fields: [{name,label,type,value,options:[{value,label}]}], submit})
// -> Promise<object|null>
export function modal({ title, fields, submitLabel = "Create" }) {
  return new Promise((resolve) => {
    const inputs = {};
    const fieldEls = fields.map((f) => {
      let input;
      if (f.type === "select") {
        input = el("select", { name: f.name },
          ...(f.options || []).map((o) =>
            el("option", { value: o.value, selected: o.value === f.value },
              o.label ?? o.value)));
      } else if (f.type === "checkbox") {
        input = el("input", { type: "checkbox", name: f.name });
        input.checked = !!f.value;
      } else if (f.type === "textarea") {
        input = el("textarea", {
          name: f.name, rows: f.rows ?? 8,
          placeholder: f.placeholder ?? "",
        });
        input.value = f.value ?? "";
      } else {
        input = el("input", {
          type: f.type || "text", name: f.name,
          value: f.value ?? "", placeholder: f.placeholder ?? "",
          step: f.step, min: f.min, max: f.max,
        });
      }
      inputs[f.name] = input;
      return el("label", { class: "f" }, f.label, input);
    });
    const done = (result) => { back.remove(); resolve(result); };
    const back = el("div", { class: "modal-back", onClick: (e) => {
      if (e.target === back) done(null);
    } },
      el("div", { class: "modal" },
        el("h2", {}, title),
        el("div", { class: "fields" }, fieldEls),
        el("div", { class: "actions" },
          el("button", { onClick: () => done(null) }, "Cancel"),
          el("button", { class: "primary", onClick: () => {
            const out = {};
            for (const f of fields) {
              const inp = inputs[f.name];
              let v = f.type === "checkbox" ? inp.checked : inp.value;
              if (f.type === "number" && v !== "") v = Number(v);
              if (v === "" && f.optional) continue;
              out[f.name] = v;
            }
            done(out);
          } }, submitLabel))));
    document.body.append(back);
    const first = Object.values(inputs)[0];
    if (first && first.focus) first.focus();
  });
}

export function confirmDlg(text) {
  return modal({ title: text, fields: [], submitLabel: "Confirm" })
    .then((r) => r !== null);
}
