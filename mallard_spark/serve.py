"""CLI entry point: run a Spark-backed Mallard Flight server.

Parity with the reference's ``python flight_server.py --location ...
--db ... --auth`` (flight_server.py:500-531): one process serving the
Flight verbs over a MallardEngine. The Spark warehouse is the
equivalent of the reference's on-disk ``--db`` path: the serve CLI
constructs the engine with ``ddl_persist=True``, so tables PUT with
``persist=True`` or created via wire DDL (CREATE TABLE ... AS)
survive restarts through the warehouse catalog.

Usage::

    python -m mallard_spark.serve --location grpc://localhost:8815 \
        --namespace server1 [--auth] [--token SECRET]

    # reference default: TWO servers in one process sharing the
    # Spark cluster (flight_server.py runs 8815 + 8816)
    python -m mallard_spark.serve --server2-location grpc://localhost:8816
"""

from __future__ import annotations

import argparse
import time


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="Spark-backed Mallard Flight server")
    parser.add_argument(
        "--location", default="grpc://localhost:8815", help="server location"
    )
    parser.add_argument("--namespace", default="server1", help="catalog namespace")
    parser.add_argument(
        "--auth",
        action="store_true",
        help="enable Basic-auth handshake (admin/password123, reference default)",
    )
    parser.add_argument("--user", default="admin")
    parser.add_argument("--password", default="password123")
    parser.add_argument(
        "--token", default=None, help="static pre-shared bearer token (alternative to --auth)"
    )
    parser.add_argument(
        "--cpus", default=None, help="local[N] cores (default: all)"
    )
    parser.add_argument(
        "--server2-location",
        default=None,
        help="also run a second server at this location (reference "
        "flight_server.py runs two servers in one process)",
    )
    parser.add_argument("--server2-namespace", default="server2")
    args = parser.parse_args(argv)

    from mallard_spark.engine import MallardEngine
    from mallard_spark.flight import SparkFlightServer
    from mallard_spark.session import get_spark

    spark = get_spark(
        app_name="mallard_flight_server",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )

    if args.server2_location:
        # Two servers, one SparkSession — the reference's default
        # topology. The manager owns lifecycle + signal handlers.
        from mallard_spark.flight import FlightServerConfig, FlightServerManager

        manager = FlightServerManager(
            spark,
            configs=[
                FlightServerConfig(
                    args.location,
                    namespace=args.namespace,
                    auth_enabled=args.auth,
                    credentials={args.user: args.password} if args.auth else None,
                    ddl_persist=True,
                ),
                FlightServerConfig(
                    args.server2_location,
                    namespace=args.server2_namespace,
                    auth_enabled=args.auth,
                    credentials={args.user: args.password} if args.auth else None,
                    ddl_persist=True,
                ),
            ],
        )

        def announce(servers):
            for cfg, srv in zip(manager.configs, servers):
                print(
                    f"serving {cfg.namespace} at {cfg.location} (port {srv.port})",
                    flush=True,
                )

        code = 0
        try:
            manager.serve_forever(on_started=announce)
        except KeyboardInterrupt:
            pass
        except SystemExit as e:
            # sys.exit("msg") carries a STRING code: print it and
            # report failure (int(...) would raise inside the handler
            # and the finally's os._exit(0) would mask the error)
            if e.code is None:
                code = 0
            elif isinstance(e.code, int):
                code = e.code
            else:
                import sys as _sys

                print(e.code, file=_sys.stderr)
                code = 1
        except BaseException:
            # print the traceback BEFORE os._exit (which skips it),
            # and report failure — a supervisor watching the exit
            # code must see a crash as a crash, not a clean shutdown
            import traceback

            traceback.print_exc()
            code = 1
        finally:
            # skip interpreter atexit: pyspark's shutdown hook can hang
            # on a JVM that died with the signal (py4j reconnect loop)
            import os

            os._exit(code)
        return

    engine = MallardEngine(spark, namespace=args.namespace, ddl_persist=True)
    server = SparkFlightServer(
        args.location,
        engine,
        auth_token=args.token,
        credentials={args.user: args.password} if args.auth else None,
    )
    print(f"serving {args.namespace} at {args.location} (port {server.port})", flush=True)

    # SIGTERM (and SIGABRT) must shut down as cleanly as ctrl-C —
    # parity: flight_server.py:476-487. SIGINT already surfaces as
    # KeyboardInterrupt in the serve loop.
    import signal

    def _stop(signum, frame):
        raise KeyboardInterrupt

    for sig in (signal.SIGTERM, signal.SIGABRT):
        try:
            signal.signal(sig, _stop)
        except (AttributeError, ValueError):
            pass

    code = 0
    try:
        server.serve()
    except KeyboardInterrupt:
        pass
    except SystemExit as e:
        # see above: a string code must not crash the handler
        if e.code is None:
            code = 0
        elif isinstance(e.code, int):
            code = e.code
        else:
            import sys as _sys

            print(e.code, file=_sys.stderr)
            code = 1
    except BaseException:
        import traceback

        traceback.print_exc()
        code = 1
    finally:
        try:
            server.shutdown()
            time.sleep(0.2)
        finally:
            # skip interpreter atexit: pyspark's shutdown hook can hang
            # on a JVM that died with the signal (py4j reconnect loop)
            import os

            os._exit(code)


if __name__ == "__main__":
    main()
