// Node example for the rten_tpu HTTP serving API (analog of the reference's
// js-examples/: its wasm Model runs in-process; ours talks to the serving
// process — see js/rten_client.js for why).
//
//   1. start a server:  python -m rten_tpu.serve.http_demo --port 8080
//      (or any script that wraps a ServingEngine in HttpServer)
//   2. node js/example.mjs http://localhost:8080
import { RtenClient } from "./rten_client.js";

const url = process.argv[2] ?? "http://localhost:8080";
const client = new RtenClient(url);

console.log("health:", await client.health());
const out = await client.generate([1, 2, 3, 4], { maxNewTokens: 8 });
console.log("generated token ids:", out.tokens, "finished:", out.finished);
