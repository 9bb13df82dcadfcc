"""Error-code taxonomy — the reference's 11-code contract
(reference: errors.py:5-42; codes and messages are observable output
carried verbatim, the structure here is ours).

Every per-partition failure funnels into one of these codes on an
Unknown/Skipped verdict row — never a job failure (reference error
funnel pattern, errors.py:33-42).
"""

from __future__ import annotations

NO_UPDATES_IN_TABLE_HISTORY = "NO_UPDATES_IN_TABLE_HISTORY"
FAILED_TO_FIT_MODEL = "FAILED_TO_FIT_MODEL"
NOT_ENOUGH_UPDATE_OP = "NOT_ENOUGH_UPDATE_OPERATIONS"
NOT_ENOUGH_UPDATE_OP_BACKTESTING = "NOT_ENOUGH_UPDATE_OP_BACKTESTING"
USER_CONFIGURED_SKIP = "USER_CONFIGURED_SKIP"
FAILED_TO_PREDICT = "FAILED_TO_PREDICT"
NOT_ENOUGH_TABLE_HISTORY = "NOT_ENOUGH_TABLE_HISTORY"
PERMISSION_DENIED = "PERMISSION_DENIED"
INTERNAL_ERROR = "INTERNAL_ERROR"
USER_ERROR = "USER_ERROR"
BLAST_RADIUS_COMPUTATION_ERROR = "BLAST_RADIUS_COMPUTATION_ERROR"
#: engine-specific addition (audio payload column, north rule)
PAYLOAD_DECODE_ERROR = "PAYLOAD_DECODE_ERROR"

ERROR_CODE_TO_MESSAGE = {
    NO_UPDATES_IN_TABLE_HISTORY:
        "The table does not have any update operations in the table history.",
    FAILED_TO_FIT_MODEL: "Failed to fit model on the table history.",
    NOT_ENOUGH_UPDATE_OP_BACKTESTING:
        "Not enough update operations in table history for backtesting.",
    NOT_ENOUGH_UPDATE_OP:
        "Not enough update operations in table history for a valid forecast.",
    USER_CONFIGURED_SKIP: "User-specified override to skip table.",
    FAILED_TO_PREDICT: "Failed to generate prediction from the model.",
    NOT_ENOUGH_TABLE_HISTORY:
        "More days of table history are required to evaluate completeness.",
    PERMISSION_DENIED:
        "Unable to retrieve table history. Please ensure you have SELECT "
        "access to the table.",
    INTERNAL_ERROR: "An internal error has occurred. Please contact support.",
    BLAST_RADIUS_COMPUTATION_ERROR: "Failed to compute blast radius.",
    PAYLOAD_DECODE_ERROR: "Failed to decode the audio payload.",
}

MESSAGE_TO_ERROR_CODE = {v: k for k, v in ERROR_CODE_TO_MESSAGE.items()}


def match_error_message_to_code(error_message: str,
                                default: str = INTERNAL_ERROR) -> str:
    """Exact message → code reverse lookup with a default, plus exception-
    type classification for the paths a distributed engine actually hits
    (reference match_error_message_to_code, errors.py:39-42)."""
    return MESSAGE_TO_ERROR_CODE.get(error_message, default)


def classify_exception(e: BaseException) -> str:
    if isinstance(e, PermissionError):
        return PERMISSION_DENIED
    if isinstance(e, (ValueError, TypeError)):
        return USER_ERROR
    return match_error_message_to_code(str(e))
