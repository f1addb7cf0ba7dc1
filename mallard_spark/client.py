"""Client-side API for Mallard-protocol Flight servers.

Parity with the reference's client surface (demo.py:40-175:
ClientConfig / FlightClientManager / DataOperations) so code written
against the reference migrates by changing an import. Pure
``pyarrow.flight`` — it speaks the wire protocol, so it works against
the Spark-backed server here, the reference's DuckDB servers, or any
mix of the two.

Beyond the reference: per-client call options (the reference client
has no auth support even though its server does), so a bearer token
or Basic credentials can ride every call.
"""

from __future__ import annotations

import base64
import time

import pyarrow as pa
import pyarrow.flight as flight


class ClientConfig:
    """One server connection. Parity: demo.py:40-49.

    ``token`` adds ``Bearer <token>`` to every call; ``credentials``
    (user, password) adds a Basic header — matching the server's
    TokenAuthMiddlewareFactory / BasicAuthMiddlewareFactory.
    """

    def __init__(
        self,
        location: str,
        name: str,
        token: str | None = None,
        credentials: tuple[str, str] | None = None,
    ):
        self.location = location
        self.name = name
        self.token = token
        self.credentials = credentials

    def call_options(self) -> flight.FlightCallOptions | None:
        if self.token:
            return flight.FlightCallOptions(
                headers=[(b"authorization", f"Bearer {self.token}".encode())]
            )
        if self.credentials:
            user, password = self.credentials
            basic = base64.b64encode(f"{user}:{password}".encode())
            return flight.FlightCallOptions(
                headers=[(b"authorization", b"Basic " + basic)]
            )
        return None

    def __str__(self) -> str:  # parity: demo.py:47-49
        return f"ClientConfig(name={self.name}, location={self.location})"


class FlightClientManager:
    """Connect/disconnect lifecycle for a set of named clients.
    Parity: demo.py:56-88."""

    def __init__(self, configs: list[ClientConfig]):
        self.configs = configs
        self.clients: dict[str, flight.FlightClient] = {}
        self._options: dict[str, flight.FlightCallOptions | None] = {}
        for config in configs:
            self.clients[config.name] = flight.connect(config.location)
            self._options[config.name] = config.call_options()

    def get_client(self, name: str) -> flight.FlightClient:
        if name not in self.clients:
            raise ValueError(f"Unknown client: {name}")
        return self.clients[name]

    def get_options(self, name: str) -> flight.FlightCallOptions | None:
        return self._options.get(name)

    def close_all(self) -> None:
        for client in self.clients.values():
            try:
                client.close()
            except Exception:
                pass
        self.clients.clear()
        self._options.clear()


class DataOperations:
    """Query / ingest / transfer / exchange / register against named
    servers. Parity: demo.py:94-175 (method-for-method)."""

    def __init__(self, client_manager: FlightClientManager):
        self.client_manager = client_manager

    def _call(self, server_name: str):
        return (
            self.client_manager.get_client(server_name),
            self.client_manager.get_options(server_name),
        )

    def execute_query(self, server_name: str, query: str) -> pa.Table:
        """do_get with a SQL (or DDL/DML) ticket → full result table."""
        client, opts = self._call(server_name)
        return client.do_get(flight.Ticket(query.encode()), options=opts).read_all()

    def create_table(self, server_name: str, table_name: str, data: pa.Table) -> None:
        """do_put the table under ``table_name`` (command descriptor)."""
        client, opts = self._call(server_name)
        descriptor = flight.FlightDescriptor.for_command(table_name.encode())
        writer, _ = client.do_put(descriptor, data.schema, options=opts)
        for batch in data.to_batches():
            writer.write_batch(batch)
        writer.close()

    def register_exchanger(self, server_name: str, exchanger_class) -> list:
        """cloudpickle the class to do_action("add_exchange")."""
        import cloudpickle

        client, opts = self._call(server_name)
        action = flight.Action("add_exchange", cloudpickle.dumps(exchanger_class))
        return list(client.do_action(action, options=opts))

    def transfer_table(
        self, from_server: str, to_server: str, table_name: str
    ) -> tuple[int, float]:
        """Stream ``table_name`` source→dest batch-at-a-time; returns
        (rows, seconds) like the reference's transfer loop."""
        src, src_opts = self._call(from_server)
        dst, dst_opts = self._call(to_server)
        reader = src.do_get(
            flight.Ticket(f"SELECT * FROM {table_name}".encode()), options=src_opts
        )
        descriptor = flight.FlightDescriptor.for_command(table_name.encode())
        writer, _ = dst.do_put(descriptor, reader.schema, options=dst_opts)
        start = time.time()
        total_rows = 0
        for chunk in reader:
            batch = chunk.data
            if batch is None or batch.num_rows == 0:
                continue
            writer.write_batch(batch)
            total_rows += batch.num_rows
        writer.close()
        return total_rows, time.time() - start

    def exchange_data(self, server_name: str, command: str, data: pa.Table) -> pa.Table:
        """do_exchange ``data`` through ``command``; returns the
        transformed table (empty table if the server answered no
        batches, like the reference)."""
        client, opts = self._call(server_name)
        descriptor = flight.FlightDescriptor.for_command(command.encode())
        writer, reader = client.do_exchange(descriptor, options=opts)
        writer.begin(data.schema)
        for batch in data.to_batches():
            writer.write_batch(batch)
        writer.done_writing()
        batches = [chunk.data for chunk in reader if chunk.data is not None]
        writer.close()
        if not batches:
            return pa.table({})
        return pa.Table.from_batches(batches)

    def health_check(self, server_name: str) -> bool:
        """do_action("health_check") → True iff the server answers ok."""
        client, opts = self._call(server_name)
        try:
            results = list(client.do_action(flight.Action("health_check", b""), options=opts))
            return bool(results) and results[0].body.to_pybytes() == b"ok"
        except Exception:
            return False
