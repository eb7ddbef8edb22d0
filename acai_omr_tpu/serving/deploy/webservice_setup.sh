#!/usr/bin/env bash
# Production web-service setup: gunicorn (threaded workers for SSE) behind
# nginx with streaming-friendly proxying + certbot TLS.
#
# Deploy-layer parity with the reference's webservice_setup.sh (gunicorn
# gevent systemd unit on a unix socket, nginx SSE config, certbot). The TPU
# stack serves the same WSGI app; gthread workers replace gevent (not baked
# into this image) — SSE generators stream fine from threads.
#
# Usage: sudo ./webservice_setup.sh <server_name> <repo_dir>
set -euo pipefail

SERVER_NAME=${1:?usage: webservice_setup.sh <server_name> <repo_dir>}
REPO_DIR=${2:?usage: webservice_setup.sh <server_name> <repo_dir>}
SOCK=/run/acai_omr.sock

cat > /etc/systemd/system/acai_omr.service <<EOF
[Unit]
Description=Acai OMR TPU web service
After=network.target

[Service]
WorkingDirectory=${REPO_DIR}
Environment="ACAI_WEIGHTS=${REPO_DIR}/tf_omr_train/vitomr"
# cross-request TPU batch formation (serving/scheduler.py): concurrent
# clients' systems share decode batches — needs threads > 1 (above)
Environment="ACAI_DYNAMIC_BATCHING=1"
Environment="ACAI_BATCH_MAX=32"
Environment="ACAI_BATCH_WAIT_MS=25"
ExecStart=$(command -v gunicorn || echo ${REPO_DIR}/.venv/bin/gunicorn) \
    --workers 1 --worker-class gthread --threads 8 \
    --timeout 300 --bind unix:${SOCK} \
    acai_omr_tpu.wsgi:app
Restart=on-failure

[Install]
WantedBy=multi-user.target
EOF

cat > /etc/nginx/sites-available/acai_omr <<EOF
server {
    listen 80;
    server_name ${SERVER_NAME};
    client_max_body_size 32M;

    location / {
        proxy_pass http://unix:${SOCK};
        proxy_set_header Host \$host;
        proxy_set_header X-Real-IP \$remote_addr;
        # SSE: no buffering, long read timeout
        proxy_buffering off;
        proxy_cache off;
        proxy_read_timeout 600s;
        proxy_http_version 1.1;
        proxy_set_header Connection "";
    }
}
EOF
ln -sf /etc/nginx/sites-available/acai_omr /etc/nginx/sites-enabled/acai_omr

systemctl daemon-reload
systemctl enable --now acai_omr
nginx -t && systemctl reload nginx

echo "To enable TLS: certbot --nginx -d ${SERVER_NAME}"
