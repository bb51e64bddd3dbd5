"""Notification channels — the native rebuild of Maestro's pluggable
failure/conflict notification surface (SURVEY.md §2.2 K5, §2.12):

  * Notifier.java:30-77 — fan-out to the eligible channels, subscribe
    errors swallowed so a broken channel never poisons indexing.
  * NotificationChannel (Slack.java, LoggingNotificationChannel.java,
    FileBasedFailuresLogger.java) — pluggable sinks with per-channel
    subscriptions; templated by notification category.
  * NotificationName.java:23-40 — the event vocabulary (ERROR/WARN
    categories), mirrored below.
  * DefaultIndexer.notifyConflicts:894-903 — conflicting documents are
    REPORTED (WARN), not silently dropped.

Driver-side by design: notifications are control-plane events (bounded
counts + samples), never a per-row data path. notify_conflicts caps its
collect — the DataFrame side aggregates first, so a million-conflict
batch ships one count and `sample_cap` examples to the driver, not the
conflict set."""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

log = logging.getLogger("maestro_spark.notify")

# NotificationName.java:23-40 (category: ERROR | WARN)
ERROR, WARN = "ERROR", "WARN"
NOTIFICATION_NAMES = {
    "INDEX_REQ_FAILED": ERROR,
    "CONVERT_ANALYSIS_TO_FILE_DOCS_FAILED": ERROR,
    "INDEX_FILE_CONFLICT": WARN,
    "ANALYSIS_CONFLICT": WARN,
    "UNHANDLED_ERROR": ERROR,
    "FAILED_TO_REMOVE_ANALYSIS": ERROR,
    "COMMAND_REJECTED": ERROR,      # DLQ-routed malformed commands
    "SHARD_BUILD_FAILED": ERROR,    # manifest shard status != ok
}
ALL = "ALL"


@dataclass
class Notification:
    """IndexerNotification analogue: a name plus attributes map."""
    name: str
    attributes: dict

    @property
    def category(self) -> str:
        return NOTIFICATION_NAMES.get(self.name, ERROR)


class NotificationChannel:
    """Base channel (NotificationChannel.java): subclasses implement
    send(); subscriptions() limits which names a channel receives
    (ALL = everything)."""

    def __init__(self, subscriptions: set[str] | None = None):
        self._subs = subscriptions or {ALL}

    def eligible(self, notification: Notification) -> bool:
        return ALL in self._subs or notification.name in self._subs

    def send(self, notification: Notification) -> bool:  # pragma: no cover
        raise NotImplementedError


class LoggingChannel(NotificationChannel):
    """LoggingNotificationChannel analogue — WARN/ERROR to the driver log."""

    def send(self, notification: Notification) -> bool:
        fn = log.error if notification.category == ERROR else log.warning
        fn("%s %s", notification.name, json.dumps(notification.attributes,
                                                  sort_keys=True, default=str))
        return True


class FileChannel(NotificationChannel):
    """FileBasedFailuresLogger analogue — JSONL append, one line per
    notification (crash-tolerant: a torn final line never corrupts
    earlier records)."""

    def __init__(self, path: str, subscriptions: set[str] | None = None):
        super().__init__(subscriptions)
        self.path = path

    def send(self, notification: Notification) -> bool:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({
                "ts_ms": int(time.time() * 1000),
                "name": notification.name,
                "category": notification.category,
                "attributes": notification.attributes,
            }, sort_keys=True, default=str) + "\n")
        return True


class WebhookChannel(NotificationChannel):
    """Slack.java analogue: POSTs a templated payload to a webhook. The
    HTTP transport is injected (`poster(url, payload) -> bool`) — the
    sandbox has no outbound network, and the reference likewise injects
    its WebClient."""

    def __init__(self, url: str, poster, subscriptions: set[str] | None = None,
                 error_template: str = ":warning: ##TYPE## ##DATA##",
                 info_template: str = "##TYPE## ##DATA##"):
        super().__init__(subscriptions)
        self.url, self.poster = url, poster
        self.error_template, self.info_template = error_template, info_template

    def send(self, notification: Notification) -> bool:
        tpl = (self.error_template if notification.category == ERROR
               else self.info_template)
        text = (tpl.replace("##TYPE##", notification.name)
                .replace("##DATA##", json.dumps(notification.attributes,
                                                sort_keys=True, default=str)))
        return bool(self.poster(self.url, {"text": text}))


class Notifier:
    """Notifier.java:30-77: fan out to eligible channels; a channel
    failure is logged and swallowed (indexing never fails because Slack
    is down — onErrorResume semantics)."""

    def __init__(self, channels: list[NotificationChannel] | None = None):
        self.channels = channels if channels is not None else [LoggingChannel()]

    def notify(self, name: str, **attributes) -> None:
        n = Notification(name, attributes)
        for ch in self.channels:
            if not ch.eligible(n):
                continue
            try:
                ch.send(n)
            except Exception:  # noqa: BLE001 — never poison the pipeline
                log.exception("notification channel %s failed",
                              type(ch).__name__)


def notify_conflicts(notifier: Notifier, conflicts: DataFrame,
                     name: str = "ANALYSIS_CONFLICT",
                     sample_cap: int = 20) -> int:
    """DefaultIndexer.notifyConflicts:894-903: report conflicting docs as
    WARN and return the count. One bounded action: total count + a
    deterministic sample of at most `sample_cap` keys reach the driver."""
    rows = conflicts.limit(sample_cap + 1).collect()
    if not rows:
        return 0
    total = len(rows) if len(rows) <= sample_cap else conflicts.count()
    notifier.notify(
        name,
        total_conflicts=int(total),
        sample=[r.asDict() for r in rows[:sample_cap]],
        truncated=total > sample_cap,
    )
    return int(total)


def notify_shard_failures(notifier: Notifier, manifest: dict) -> list[int]:
    """A2 failure-set surface: shards whose manifest status is not ok
    (partial failure never poisons the run — SearchAdapterHelper.java:
    127-142; here the failure set also reaches the channels)."""
    bad = sorted(int(s) for s, e in manifest.get("shards", {}).items()
                 if e.get("status") != "ok")
    if bad:
        notifier.notify("SHARD_BUILD_FAILED", shards=bad)
    return bad
