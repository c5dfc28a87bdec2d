"""Protocol orchestration: 3-phase client/server, transport, measurements
(reference: src/Client/PSIClient.hpp, src/Server/PSIServer.hpp)."""
