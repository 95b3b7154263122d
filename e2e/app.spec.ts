// Browser e2e: drives the served SPA against a fake-driver server
// (reference frontend/e2e/).  Covers the flows the round-2 review called
// out: page load + spectrum paint, channel create + listen, bookmark
// manager, device rename, trunking system creation, error status bar.

import { test, expect, Page } from "@playwright/test";

async function fillModalField(page: Page, label: string, value: string) {
  const field = page.locator(".modal label.f", { hasText: label }).locator("input, select, textarea");
  const tag = await field.evaluate((el) => el.tagName.toLowerCase());
  if (tag === "select") await field.selectOption(value);
  else await field.fill(value);
}

test("loads the shell and every view renders without the error boundary", async ({ page }) => {
  await page.goto("/");
  await expect(page).toHaveTitle(/WaveCap TPU/);
  for (const view of ["Monitor", "Trunking", "Scanner", "Messages", "Recipes", "Devices", "System"]) {
    await page.locator("nav.side a", { hasText: view }).click();
    await expect(page.locator("main.content h1").first()).toBeVisible();
    await expect(page.locator(".error-boundary")).toHaveCount(0);
  }
});

test("creates a capture, sees the spectrum paint, adds a channel and listens", async ({ page }) => {
  await page.goto("/#/monitor");
  await page.locator("button", { hasText: "+ New capture" }).click();
  await fillModalField(page, "Center frequency", "100");
  await page.locator(".modal button.primary").click();
  // the new capture panel appears and auto-selects
  const panel = page.locator(".panel", { hasText: "Capture" }).first();
  await expect(panel.locator(".badge")).toHaveText(/running|starting/, { timeout: 30_000 });

  // spectrum canvas paints non-background pixels once frames arrive
  const canvas = panel.locator(".spectrum-wrap canvas").first();
  await expect(canvas).toBeVisible({ timeout: 30_000 });
  await expect
    .poll(
      () =>
        canvas.evaluate((cv: HTMLCanvasElement) => {
          const g = cv.getContext("2d");
          if (!g) return 0;
          const d = g.getImageData(0, 0, cv.width, cv.height).data;
          let lit = 0;
          for (let i = 0; i < d.length; i += 4) if (d[i] + d[i + 1] + d[i + 2] > 30) lit++;
          return lit;
        }),
      { timeout: 30_000 }
    )
    .toBeGreaterThan(100);

  // add a channel and toggle playback
  await page.locator("button", { hasText: "+ channel" }).click();
  await fillModalField(page, "Name", "e2e-ch");
  await page.locator(".modal button.primary").click();
  const row = page.locator("tr", { hasText: "e2e-ch" });
  await expect(row).toBeVisible();
  await row.locator("button", { hasText: "Listen" }).click();
  await expect(row.locator("button", { hasText: "Stop" })).toBeVisible();
});

test("bookmark manager: add, tab switch, history, delete", async ({ page }) => {
  await page.goto("/#/monitor");
  await page.locator("button", { hasText: "Bookmarks" }).click();
  const dlg = page.locator(".modal.wide");
  await expect(dlg).toBeVisible();
  await dlg.locator("button", { hasText: "Add" }).click();
  await fillModalField(page, "Name", "e2e-kexp");
  await fillModalField(page, "Frequency", "90.3");
  await page.locator(".modal:not(.wide) button.primary").click();
  await expect(dlg.locator("tr", { hasText: "e2e-kexp" })).toBeVisible();
  await dlg.locator(".tab", { hasText: "History" }).click();
  await expect(dlg.locator(".tab.active")).toHaveText(/History/);
  await dlg.locator(".tab", { hasText: "Bookmarks" }).click();
  await dlg.locator("tr", { hasText: "e2e-kexp" }).locator("button", { hasText: "✕" }).click();
  await expect(dlg.locator("tr", { hasText: "e2e-kexp" })).toHaveCount(0);
});

test("device rename persists through the API", async ({ page }) => {
  await page.goto("/#/devices");
  const row = page.locator("tbody tr", { hasText: "fake0" });
  await row.locator("button", { hasText: "Rename" }).click();
  await fillModalField(page, "Nickname", "e2e-roof");
  await page.locator(".modal button.primary").click();
  await expect(page.locator("#toasts .toast")).toHaveText(/Saved/);
  await page.reload();
  await expect(page.locator("tbody tr", { hasText: "fake0" })).toContainText("e2e-roof");
});

test("trunking: create a system and watch it hunt", async ({ page }) => {
  await page.goto("/#/trunking");
  await page.locator("button", { hasText: "+ New system" }).click();
  await fillModalField(page, "System id", "e2e-sys");
  await page.locator(".modal button.primary").click();
  const row = page.locator("tr", { hasText: "e2e-sys" });
  await expect(row).toBeVisible({ timeout: 15_000 });
  await expect(row.locator(".badge")).toHaveText(/hunting|running|created|locked/, {
    timeout: 30_000,
  });
});

test("status bar stays hidden while the server is healthy", async ({ page }) => {
  await page.goto("/");
  await expect(page.locator(".status-bar")).toBeHidden();
});
