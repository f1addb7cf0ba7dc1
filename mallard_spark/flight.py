"""Arrow Flight endpoint backed by the Spark engine.

Wire-level parity with the reference (flight_server.py in
/root/reference): a gRPC Flight server where

- ``do_get``   executes a SQL ticket and streams Arrow batches back
               (flight_server.py DuckDBFlightServer.do_get),
- ``do_put``   ingests an Arrow stream as a named table,
- ``do_exchange`` runs a registered exchanger over the incoming
               stream and streams the transformed batches back
               (MyStreamingExchanger parity — but the transform runs
               distributed via mapInPandas, not on one server thread),
- ``list_flights`` enumerates tables,
- optional token auth mirrors AuthMiddlewareFactory.

The compute engine behind the endpoint is Spark, so a Mallard client
pointing at this server gets cluster-scale SQL instead of a single
DuckDB process. (Clients exchange Arrow either way — the protocol
does not change.)
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight

from mallard_spark.engine import MallardEngine


def _df_to_arrow(df) -> pa.Table:
    try:  # Spark 4: native Arrow export
        return df.toArrow()
    except AttributeError:  # pragma: no cover
        return pa.Table.from_pandas(df.toPandas(), preserve_index=False)


class TokenAuthMiddlewareFactory(flight.ServerMiddlewareFactory):
    """Bearer-token check (parity: flight_server.py AuthMiddlewareFactory)."""

    def __init__(self, token: str):
        self._token = token

    def start_call(self, info, headers):
        auth = headers.get("authorization") or headers.get("Authorization")
        if not auth or auth[0] != f"Bearer {self._token}":
            raise flight.FlightUnauthenticatedError("invalid or missing token")
        return None


class SparkFlightServer(flight.FlightServerBase):
    """One Mallard 'server': Flight verbs over a MallardEngine."""

    def __init__(
        self,
        location: str,
        engine: MallardEngine,
        auth_token: str | None = None,
    ):
        middleware = (
            {"auth": TokenAuthMiddlewareFactory(auth_token)} if auth_token else None
        )
        super().__init__(location, middleware=middleware)
        self.engine = engine
        self._location = location

    # -- GET: SQL ticket → Arrow stream --------------------------------
    def do_get(self, context, ticket: flight.Ticket):
        sql = ticket.ticket.decode("utf-8")
        table = _df_to_arrow(self.engine.sql(sql))
        return flight.RecordBatchStream(table)

    # -- PUT: Arrow stream → named table -------------------------------
    def do_put(self, context, descriptor, reader, writer):
        name = descriptor.command.decode("utf-8")
        table = reader.read_all()
        self.engine.put(name, table)

    # -- EXCHANGE: stream through a registered transform ----------------
    def do_exchange(self, context, descriptor, reader, writer):
        command = descriptor.command.decode("utf-8")
        table = reader.read_all()
        out_df = self.engine.exchange(command, table)
        out = _df_to_arrow(out_df)
        writer.begin(out.schema)
        for batch in out.to_batches():
            writer.write_batch(batch)
        writer.close()

    # -- catalog listing ------------------------------------------------
    def list_flights(self, context, criteria):
        for name in self.engine.list_tables():
            arrow_schema = _df_to_arrow(self.engine.table(name).limit(0)).schema
            yield flight.FlightInfo(
                arrow_schema,
                flight.FlightDescriptor.for_command(name.encode()),
                [flight.FlightEndpoint(name.encode(), [self._location])],
                -1,
                -1,
            )


def serve_in_background(server: SparkFlightServer) -> threading.Thread:
    """Run the Flight server on a daemon thread (tests / local use)."""
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return t
