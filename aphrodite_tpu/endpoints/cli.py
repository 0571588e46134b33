"""CLI: `python -m aphrodite_tpu run <model>` starts the OpenAI server.

Reference: aphrodite/endpoints/cli.py:156-202 (`aphrodite run/complete/
chat`), console script `setup.py:528-530`; default port 2242.
"""

import argparse
import asyncio
import sys

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.engine.args import EngineArgs

logger = init_logger(__name__)


def _add_serve_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("model", type=str, help="model directory")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=2242)
    parser.add_argument("--served-model-name", type=str, default=None)
    parser.add_argument("--api-keys", type=str, default=None,
                        help="comma-separated list of accepted API keys")
    EngineArgs.add_cli_args(parser)


def _run(args: argparse.Namespace) -> None:
    from aphrodite_tpu.endpoints.openai.api_server import run_server

    engine_args = EngineArgs.from_cli_args(args)
    engine_args.model = args.model
    served = [args.served_model_name] if args.served_model_name else None
    api_keys = args.api_keys.split(",") if args.api_keys else None
    asyncio.run(
        run_server(engine_args, host=args.host, port=args.port,
                   served_model_names=served, api_keys=api_keys))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="aphrodite-tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    serve = sub.add_parser("run", help="start the OpenAI-compatible server")
    _add_serve_args(serve)
    args = parser.parse_args(argv)
    if args.command == "run":
        _run(args)
        return 0
    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
