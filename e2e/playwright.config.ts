// Browser e2e for the WaveCap TPU SPA (reference frontend/playwright.config.ts).
//
// Runs against a fake-driver server so no SDR hardware (and no TPU: the
// engine compiles on whatever JAX backend exists) is needed:
//
//   npx playwright install chromium
//   npx playwright test
//
// The CI container this repo builds in has no browser or node runtime, so
// these specs are exercised on developer machines; tests/test_e2e_specs.py
// statically pins every selector/route used here against the shipped SPA
// source so the suite cannot silently rot in the meantime.

import { defineConfig } from "@playwright/test";

export default defineConfig({
  testDir: ".",
  timeout: 60_000,
  retries: 1,
  use: {
    baseURL: "http://127.0.0.1:8123",
    trace: "on-first-retry",
  },
  webServer: {
    command: "cd .. && JAX_PLATFORMS=cpu python -m wavecap_tpu.server --port 8123",
    url: "http://127.0.0.1:8123/api/v1/health",
    reuseExistingServer: true,
    timeout: 120_000,
  },
});
