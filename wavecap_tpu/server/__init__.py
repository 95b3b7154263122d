"""HTTP/WebSocket service layer."""

from .app import AppServer, AppState, build_router
from .httpd import HttpServer, Router, Request, Response, WebSocket, HttpError

__all__ = [n for n in dir() if not n.startswith("_")]
