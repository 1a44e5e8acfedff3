"""Alert delivery: the email sink for surveillance alert streams —
the reference's SMTP configuration surface
(`healthcare-env-example.sh:53-58`: SMTP_HOST/PORT/USER/PASSWORD,
ALERT_EMAIL) wired to `surveillance.alert_stream`, which previously
only sank alerts to memory/console.

Design: alerts are the OUTPUT of a thresholded windowed aggregation —
a handful of rows per micro-batch by construction — so delivery is a
`foreachBatch` driver-side send, not a distributed write. The SMTP
transport is injectable (any smtplib.SMTP-compatible factory), which
keeps the formatting/batching logic testable without a mail server
and lets deployments swap in SES/relay clients; the default transport
is stdlib `smtplib` with STARTTLS, created lazily so importing this
module never touches the network.
"""

from __future__ import annotations

import logging
from email.message import EmailMessage

from pyspark.sql import DataFrame

_log = logging.getLogger("hrdp.alerts")

#: env keys, verbatim from healthcare-env-example.sh:53-58
ENV_KEYS = (
    "SMTP_HOST",
    "SMTP_PORT",
    "SMTP_USER",
    "SMTP_PASSWORD",
    "ALERT_EMAIL",
)


def _default_transport(host: str, port: int):
    import smtplib

    smtp = smtplib.SMTP(host, port, timeout=30)
    smtp.starttls()
    return smtp


class AlertEmailSink:
    """foreachBatch sink that emails each micro-batch's alert rows.

    `config` uses the reference's env keys (ENV_KEYS); `transport` is
    a callable (host, port) -> SMTP-like object exposing login /
    send_message / quit. Batches with no rows send nothing. Rows per
    message are capped (`max_rows`) — an alert email is a pager, not
    an export; the full alert set still lands in whatever durable
    sink the stream also writes.
    """

    def __init__(
        self,
        config: dict[str, str],
        transport=None,
        max_rows: int = 100,
    ):
        missing = [k for k in ("SMTP_HOST", "ALERT_EMAIL") if not config.get(k)]
        if missing:
            raise ValueError(f"alert sink config missing {missing}")
        self.config = config
        self.transport = transport or _default_transport
        self.max_rows = max_rows
        self.sent = 0  # messages delivered (for status endpoints)

    def format_message(self, rows: list[dict], batch_id: int) -> EmailMessage:
        msg = EmailMessage()
        kinds = sorted({str(r.get("alert_type", "ALERT")) for r in rows})
        msg["Subject"] = (
            f"[surveillance] {len(rows)} alert(s): {', '.join(kinds)} "
            f"(batch {batch_id})"
        )
        msg["From"] = self.config.get("SMTP_USER") or "surveillance@localhost"
        msg["To"] = self.config["ALERT_EMAIL"]
        lines = [f"{len(rows)} alert(s) in micro-batch {batch_id}:", ""]
        for r in rows[: self.max_rows]:
            lines.append("  " + ", ".join(f"{k}={v}" for k, v in sorted(r.items())))
        if len(rows) > self.max_rows:
            lines.append(f"  ... {len(rows) - self.max_rows} more (truncated)")
        msg.set_content("\n".join(lines))
        return msg

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch hook. Alert frames are tiny post-threshold
        aggregates; the limit is a guard, not a sampler."""
        rows = [r.asDict() for r in batch_df.limit(self.max_rows + 1).collect()]
        if not rows:
            return
        msg = self.format_message(rows, batch_id)
        smtp = self.transport(
            self.config["SMTP_HOST"], int(self.config.get("SMTP_PORT") or 587)
        )
        try:
            user, pw = self.config.get("SMTP_USER"), self.config.get("SMTP_PASSWORD")
            if user and pw:
                smtp.login(user, pw)
            smtp.send_message(msg)
            self.sent += 1
            _log.info("alert email sent: %s", msg["Subject"])
        finally:
            smtp.quit()


def deliver_alerts(
    alerts: DataFrame,
    sink: AlertEmailSink,
    query_name: str = "alert_email",
    output_mode: str = "complete",
    available_now: bool = True,
):
    """Attach the email sink to an alert stream via foreachBatch and
    start the query. `available_now=True` drains the backlog and stops
    (the batch/test shape); False leaves a continuous trigger running.
    Returns the StreamingQuery."""
    writer = (
        alerts.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
