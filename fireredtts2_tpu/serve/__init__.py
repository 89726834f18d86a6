"""Serving: websocket/http servers, sessions, monitoring."""
