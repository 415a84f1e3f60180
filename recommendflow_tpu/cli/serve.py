"""CLI: serve the text encoder and/or an exported model over HTTP.

The in-framework replacement for the reference's external bert-serving
process (bert_encoder.py:22,85-101) and its frozen-graph online encoders
(onnx_utils.py:102-137):

    python -m recommendflow_tpu.cli.serve --vocab vocab.txt \\
        --weights /path/encoder_dir --port 8500
    python -m recommendflow_tpu.cli.serve --model model.rfx --port 8500

    curl -XPOST :8500/encode -d '{"texts": ["hello"]}'
    curl -XPOST :8500/predict -d '{"batch": {"item_id": [[...]], ...}}'
"""
from __future__ import annotations

import argparse

from recommendflow_tpu.utils.tables import print_args


def main(argv=None):
    from recommendflow_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # warm-process compiles -> seconds
    p = argparse.ArgumentParser(description="HTTP serving for encoder/model")
    p.add_argument("--vocab", default=None, help="vocab.txt -> enables /encode")
    p.add_argument("--weights", default=None, help="encoder weights dir")
    p.add_argument("--model", default=None, help=".rfx export -> enables /predict")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--model_dim", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--pooling", default="cls")
    p.add_argument("--whitening", action="store_true")
    p.add_argument("--max_batch", type=int, default=4096)
    p.add_argument("--batch_window_ms", type=float, default=4.0,
                   help="coalesce concurrent /encode requests into one "
                   "device batch within this window (0 disables)")
    args = p.parse_args(argv)
    print_args(args)

    if args.weights and not args.vocab:
        p.error("--weights requires --vocab (it loads encoder weights)")
    encoder = None
    if args.vocab:
        from recommendflow_tpu.encoder import TextEncoderService, Tokenizer
        encoder = TextEncoderService(
            Tokenizer(args.vocab), max_len=args.max_len,
            use_whitening=args.whitening, model_dim=args.model_dim,
            num_layers=args.num_layers, pooling=args.pooling)
        if args.weights:
            encoder.load_weights(args.weights)
        # compile before accepting traffic; must NOT auto-fit whitening on
        # the warmup dummy (that would crash on np.cov of 1 sample — or
        # worse, silently poison every embedding with junk statistics)
        encoder.warmup()

    serving_model = None
    if args.model:
        from recommendflow_tpu.export import ServingModel
        serving_model = ServingModel.load(args.model)

    from recommendflow_tpu.serving import EncodeServer, make_server
    backend = EncodeServer(encoder=encoder, serving_model=serving_model,
                           max_batch=args.max_batch,
                           batch_window_ms=args.batch_window_ms)
    httpd = make_server(backend, args.host, args.port)
    endpoints = backend.handle_health({})["endpoints"]
    print(f"serving {endpoints} on {args.host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        httpd.shutdown()
    finally:
        backend.close()  # stop the micro-batcher worker thread


if __name__ == "__main__":
    main()
