/**
 * rten_tpu JavaScript client — the browser/Node-facing binding analog of the
 * reference's wasm-bindgen API (reference: src/wasm_api.rs:15-211 exposes
 * Model/Tensor to JS; index.js:1-40 is its loader). A TPU framework cannot
 * run inside the browser, so the JS surface binds to the serving process
 * instead: a fetch-based client for the HTTP JSON API (rten_tpu/serve/http.py).
 *
 * Works in any browser and in Node ≥18 (global fetch) with zero dependencies.
 *
 *   import { RtenClient } from "./rten_client.js";
 *   const client = new RtenClient("http://localhost:8080");
 *   const { tokens } = await client.generate([464, 2068, 7586], { maxNewTokens: 16 });
 *
 * API schema (see docs/http_api.md):
 *   POST /generate  {"prompt": [ids], "max_new_tokens": N, "eos": [ids]}
 *                 → {"request_id": n, "tokens": [ids], "finished": bool}
 *   GET  /healthz → {"status": "ok", "active": n, "queued": n, "steps": n}
 *   GET  /stats   → engine + model counters
 */

export class RtenClient {
  /**
   * @param {string} baseUrl - serving endpoint, e.g. "http://localhost:8080"
   * @param {{timeoutMs?: number, fetch?: typeof fetch}} [opts]
   */
  constructor(baseUrl, opts = {}) {
    this.baseUrl = baseUrl.replace(/\/+$/, "");
    this.timeoutMs = opts.timeoutMs ?? 300_000;
    this._fetch = opts.fetch ?? fetch;
  }

  async _request(path, init = {}) {
    const ctl = new AbortController();
    const timer = setTimeout(() => ctl.abort(), this.timeoutMs);
    try {
      const res = await this._fetch(this.baseUrl + path, {
        ...init,
        signal: ctl.signal,
      });
      const body = await res.json();
      if (!res.ok) {
        throw new RtenServerError(body.error ?? `HTTP ${res.status}`, res.status);
      }
      return body;
    } finally {
      clearTimeout(timer);
    }
  }

  /**
   * Generate a continuation for a tokenized prompt.
   * @param {number[]} prompt - token ids
   * @param {{maxNewTokens?: number, eos?: number[]}} [opts]
   * @returns {Promise<{request_id: number, tokens: number[], finished: boolean}>}
   */
  async generate(prompt, opts = {}) {
    if (!Array.isArray(prompt) || prompt.some((t) => !Number.isInteger(t))) {
      throw new TypeError("prompt must be an array of integer token ids");
    }
    return this._request("/generate", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({
        prompt,
        max_new_tokens: opts.maxNewTokens ?? 32,
        eos: opts.eos ?? [],
      }),
    });
  }

  /** @returns {Promise<{status: string, active: number, queued: number, steps: number}>} */
  async health() {
    return this._request("/healthz");
  }

  /** @returns {Promise<object>} engine + model counters */
  async stats() {
    return this._request("/stats");
  }
}

export class RtenServerError extends Error {
  constructor(message, status) {
    super(message);
    this.name = "RtenServerError";
    this.status = status;
  }
}

export default RtenClient;
